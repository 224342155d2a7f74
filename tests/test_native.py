"""Native (C++) runtime vs oracle — bit parity and batch APIs."""

import shutil

import numpy as np
import pytest

from bzip3_tpu.models.block_codec import encode_block, decode_block
from bzip3_tpu.ops.ref.crc32 import crc32 as ref_crc

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

RNG = np.random.default_rng(11)
BS = 131072


@pytest.fixture(scope="module")
def native():
    from bzip3_tpu.ops import native as m

    m._load()
    return m


@pytest.fixture(scope="module")
def cases(text_data):
    return [
        b"",
        b"x" * 40,
        b"banana" * 200,
        bytes(RNG.integers(0, 256, 70000, dtype=np.uint8)),
        b"\x00" * 70000,
        text_data[:65536],
        (text_data * 4)[:120000],
    ]


def test_native_crc_parity(native, cases):
    for c in cases:
        assert native.crc32(c) == ref_crc(c)


def test_native_block_parity(native, cases):
    codec = native.NativeCodec(BS)
    for i, c in enumerate(cases):
        e_native = codec.encode_block(c)
        e_oracle = encode_block(c)
        assert e_native == e_oracle, i
        assert codec.decode_block(e_native, len(c)) == c, i
        assert decode_block(e_native, len(c), BS) == c, i
        assert codec.decode_block(e_oracle, len(c)) == c, i


def test_native_batch_apis(native, cases):
    codec = native.NativeCodec(BS)
    enc = native.encode_blocks(list(cases))
    assert enc == [codec.encode_block(c) for c in cases]
    dec = native.decode_blocks([(e, len(c)) for e, c in zip(enc, cases)], BS)
    assert dec == list(cases)


def test_native_rejects_corruption(native, cases):
    from bzip3_tpu.errors import Bz3Error

    codec = native.NativeCodec(BS)
    e = bytearray(codec.encode_block(cases[5]))
    e[len(e) // 2] ^= 0xFF
    with pytest.raises(Bz3Error):
        codec.decode_block(bytes(e), len(cases[5]))


def test_engine_registry(native, cases):
    from bzip3_tpu.engines import get_engine

    eng = get_engine("native")
    oracle = get_engine("oracle")
    enc_n = eng.encode_blocks(list(cases), BS)
    enc_o = oracle.encode_blocks(list(cases), BS)
    assert enc_n == enc_o
    assert eng.decode_blocks([(e, len(c)) for e, c in zip(enc_n, cases)], BS) == list(
        cases
    )


def test_big_block_u64_inverse_path(native):
    """Blocks past 2^24 bytes use the u64 packed-node inverse-BWT path;
    round-trip an incompressible 17 MiB block through it."""
    n = (1 << 24) + 4097
    src = np.random.default_rng(41).integers(0, 256, n, dtype=np.uint8).tobytes()
    codec = native.NativeCodec(n)
    enc = codec.encode_block(src)
    assert codec.decode_block(enc, n) == src
