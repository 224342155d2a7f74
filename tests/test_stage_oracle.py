"""Round-trip and edge-case tests for the oracle stage codecs."""

import os
import random

import pytest

from bzip3_tpu.ops.ref import (
    bwt_forward,
    bwt_inverse,
    cm_decode,
    cm_encode,
    crc32,
    lzp_decode,
    lzp_encode,
    rle_decode,
    rle_encode,
)

rng = random.Random(0xB23)


def test_crc32_known_vector():
    # CRC-32C table recurrence with init=1, no final xor: locked-in
    # value computed from the reference implementation.
    assert crc32(b"123456789") == 0xACDD2C68
    assert crc32(b"") == 1


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"ab" * 500,
        b"\x00" * 10000,
        bytes(rng.randrange(256) for _ in range(3000)),
        b"".join(bytes([i % 256]) * (i % 260 + 1) for i in range(300)),
        b"x" * 255,
        b"x" * 256,
        b"x" * 257,
        b"x" * 511,
        b"x" * 512,
    ],
)
def test_rle_roundtrip(data):
    enc = rle_encode(data)
    assert rle_decode(enc, len(data)) == data


def test_rle_malformed():
    assert rle_decode(b"", 5) is None
    assert rle_decode(b"\x00" * 31, 5) is None
    # gate byte 'a' then truncated run
    assert rle_decode(bytes([1] + [0] * 31) + b"\x00", 5) is None


@pytest.mark.parametrize(
    "data",
    [
        b"the quick brown fox " * 100,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"\xf2" * 500 + b"abc" * 500 + b"\xf2\xff" * 100,
        b"A" * 80,  # exactly above the min-size gate
        os.urandom(73),
    ],
)
def test_lzp_roundtrip(data):
    enc = lzp_encode(data)
    if enc is None:
        return
    dec = lzp_decode(enc, len(data) + 64)
    assert dec == data


def test_lzp_too_small():
    assert lzp_encode(b"x" * 71) is None


def test_lzp_truncated_token():
    data = b"the quick brown fox jumps over the lazy dog " * 50
    enc = lzp_encode(data)
    assert enc is not None
    # chop inside: decoding a truncated stream must not crash
    for cut in (len(enc) - 1, len(enc) // 2, 5):
        out = lzp_decode(enc[:cut], len(data) + 64)
        assert out is None or isinstance(out, bytes)


@pytest.mark.parametrize(
    "data",
    [
        b"banana",
        b"mississippi" * 10,
        b"",
        b"a",
        b"aa",
        b"ab",
        bytes(rng.randrange(4) for _ in range(2000)),
        bytes(rng.randrange(256) for _ in range(997)),
        b"\x00" * 300,
    ],
)
def test_bwt_roundtrip(data):
    u, idx = bwt_forward(data)
    assert len(u) == len(data)
    assert bwt_inverse(u, idx) == data


def test_bwt_bad_index():
    u, idx = bwt_forward(b"hello world hello world")
    assert bwt_inverse(u, 0) is None
    assert bwt_inverse(u, len(u) + 1) is None


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a" * 100,
        b"hello world " * 64,
        bytes(rng.randrange(256) for _ in range(4096)),
    ],
)
def test_cm_roundtrip(data):
    enc = cm_encode(data)
    assert cm_decode(enc, len(data)) == data


def test_cm_decode_short_input():
    # Decoder must tolerate truncated input (shifts in 0xFF bytes).
    data = b"some block payload " * 10
    enc = cm_encode(data)
    out = cm_decode(enc[: len(enc) // 2], len(data))
    assert isinstance(out, bytes) and len(out) == len(data)


# ----------------------------------------------- parallel CM encoder

def test_cm_parallel_decomposition_bit_exact(text_data):
    """The 3-phase parallel CM encoder (sorted per-slot counter chains
    + speculative segmented evaluation + table-free range-coder pass)
    is byte-identical to the serial coder."""
    import numpy as np
    from bzip3_tpu.ops.ref.cm import cm_encode
    from bzip3_tpu.ops.ref.cm_parallel import cm_encode_parallel

    rng = np.random.default_rng(21)
    cases = [
        b"",
        b"a",
        bytes(rng.integers(0, 256, 600, dtype=np.uint8)),
        b"\x00" * 500,
        bytes(rng.integers(0, 8, 800, dtype=np.uint8)),
        text_data[:2000],
    ]
    for i, c in enumerate(cases):
        assert cm_encode_parallel(c) == cm_encode(c), i


def test_cm_parallel_small_segments(text_data):
    """Tiny segments force many speculative warm-ups; still bit-exact."""
    from bzip3_tpu.ops.ref.cm import cm_encode
    from bzip3_tpu.ops.ref.cm_parallel import cm_encode_parallel

    c = text_data[:1500]
    assert cm_encode_parallel(c, seg=64) == cm_encode(c)
