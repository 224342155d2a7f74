"""Differential tests: all engines must agree byte-for-byte on encode
and agree on accept/reject for corrupted input."""

import shutil

import numpy as np
import pytest

from bzip3_tpu.errors import Bz3Error
from bzip3_tpu.engines import get_engine

RNG = np.random.default_rng(31)
BS = 4096  # small width keeps the device-pipeline compile cheap

needs_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")


def _inputs(text_data):
    out = [
        bytes(RNG.integers(0, 256, int(RNG.integers(0, 3000)), dtype=np.uint8))
        for _ in range(4)
    ]
    out += [
        bytes(RNG.integers(0, 3, 2000, dtype=np.uint8)),
        (b"pattern" * 300)[:1999],
        text_data[:2500],
        b"",
        b"q" * 63,
        b"q" * 65,
    ]
    return out


@needs_gxx
def test_engines_encode_identically(text_data):
    engines = [get_engine(n) for n in ("oracle", "native", "device")]
    blocks = _inputs(text_data)
    encoded = [e.encode_blocks(blocks, BS) for e in engines]
    assert encoded[0] == encoded[1] == encoded[2]
    for e in engines:
        assert e.decode_blocks(
            [(b, len(d)) for b, d in zip(encoded[0], blocks)], BS
        ) == blocks


@needs_gxx
def test_engines_agree_on_corruption(text_data):
    oracle = get_engine("oracle")
    nat = get_engine("native")
    base = oracle.encode_blocks([text_data[:2500]], BS)[0]
    for trial in range(12):
        b = bytearray(base)
        flips = int(RNG.integers(1, 5))
        for _ in range(flips):
            b[int(RNG.integers(0, len(b)))] ^= 1 << int(RNG.integers(0, 8))
        blk = bytes(b)
        outcomes = []
        for eng in (oracle, nat):
            try:
                out = eng.decode_blocks([(blk, 2500)], BS)[0]
                outcomes.append(("ok", out))
            except Bz3Error:
                outcomes.append(("err", None))
        assert outcomes[0][0] == outcomes[1][0], trial
        if outcomes[0][0] == "ok":
            assert outcomes[0][1] == outcomes[1][1], trial
