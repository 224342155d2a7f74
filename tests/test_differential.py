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


@pytest.mark.slow
def test_corruption_differential_vs_reference_binary(tmp_path, text_data):
    """Differential accept/reject against the compiled REFERENCE
    binary (local-only; skips where /root/reference is absent): random
    byte flips and truncations of a multi-block stream must make both
    decoders agree on success vs failure, and byte-agree on mutual
    success.  This pins the hardening checks to the reference's actual
    behavior, not just our oracle's reading of it."""
    import importlib.util
    import os
    import shutil
    import subprocess
    import sys

    # Single canonical reference-binary builder (shared with the
    # differential campaign harness, so flags can never drift).
    spec = importlib.util.spec_from_file_location(
        "bz3diff",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "differential_vs_reference.py"),
    )
    bz3diff = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bz3diff)
    if shutil.which("gcc") is None:
        pytest.skip("no C toolchain")
    if not bz3diff.ensure_refbin():
        pytest.skip("reference sources not available")
    refbin = bz3diff.REFBIN

    src = (text_data * 3)[: 3 << 20]
    plain = tmp_path / "in.txt"
    plain.write_bytes(src)
    enc = subprocess.run(
        [sys.executable, "-m", "bzip3_tpu", "--engine", "native",
         "-e", "-b", "1", "-c", str(plain)],
        capture_output=True, check=True,
    ).stdout
    assert enc.count(b"BZ3v1") == 1 and len(enc) > 4096

    rng = np.random.default_rng(99)
    agree = 0
    for trial in range(16):
        b = bytearray(enc)
        if trial % 4 == 3:
            b = b[: int(rng.integers(16, len(b)))]  # truncation
        else:
            for _ in range(int(rng.integers(1, 4))):
                b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        blob = bytes(b)
        bad = tmp_path / f"t{trial}.bz3"
        bad.write_bytes(blob)
        ref = subprocess.run([refbin, "-d", "-c", str(bad)], capture_output=True)
        ours = subprocess.run(
            [sys.executable, "-m", "bzip3_tpu", "--engine", "native",
             "-d", "-c", str(bad)],
            capture_output=True,
        )
        ok_ref = ref.returncode == 0
        ok_ours = ours.returncode == 0
        assert ok_ref == ok_ours, (trial, ref.stderr, ours.stderr)
        if ok_ref:
            assert ref.stdout == ours.stdout, trial
            agree += 1
    # corrupted streams must mostly fail — if every flip/truncation is
    # accepted by both decoders, hardening has regressed in lockstep.
    assert agree < 16
