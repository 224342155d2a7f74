"""Block codec orchestration + untrusted-input hardening tests.

The hardening cases mirror the checks the reference fuzzers exercise
(reference: examples/fuzz-decode-block.c, src/libbz3.c:656-809).
"""

import os
import random
import struct

import pytest

from bzip3_tpu import Bz3Codec, Bz3Error, bound
from bzip3_tpu.models.block_codec import decode_block, encode_block

BS = 65 * 1024
rng = random.Random(5)


def roundtrip(data: bytes, block_size: int = BS) -> bytes:
    codec = Bz3Codec(block_size)
    enc = codec.encode_block(data)
    assert len(enc) <= bound(len(data)) or len(data) < 64
    return codec.decode_block(enc, len(data))


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"x",
        b"y" * 63,
        b"z" * 64,
        os.urandom(65),
        b"hello world, blocks! " * 1000,
        os.urandom(2000),
        b"\x00" * 30000,
        bytes(rng.randrange(256) for _ in range(64 * 1024)),
    ],
)
def test_block_roundtrip(data):
    assert roundtrip(data) == data


def test_block_too_big():
    codec = Bz3Codec(BS)
    with pytest.raises(Bz3Error):
        codec.encode_block(b"a" * (BS + 1))


def test_invalid_block_size():
    with pytest.raises(Bz3Error):
        Bz3Codec(65 * 1024 - 1)
    with pytest.raises(Bz3Error):
        Bz3Codec(512 * 1024 * 1024)


def test_literal_block_format():
    data = b"tiny"
    enc = encode_block(data)
    # [crc:4][-1:4][data]
    assert len(enc) == 8 + len(data)
    assert struct.unpack_from("<i", enc, 4)[0] == -1
    assert enc[8:] == data


def test_decode_corrupt_crc():
    data = b"payload " * 200
    enc = bytearray(encode_block(data))
    enc[0] ^= 0xFF
    with pytest.raises(Bz3Error):
        decode_block(bytes(enc), len(data), BS)


def test_decode_corrupt_literal_crc():
    enc = bytearray(encode_block(b"abc"))
    enc[1] ^= 0x10
    with pytest.raises(Bz3Error):
        decode_block(bytes(enc), 3, BS)


def test_decode_truncated():
    data = b"payload " * 200
    enc = encode_block(data)
    for cut in (0, 4, 8, 9, 12, len(enc) - 4):
        try:
            decode_block(enc[:cut], len(data), BS)
        except Bz3Error:
            pass  # any clean error is fine; crashing is not


def test_decode_bad_bwt_index():
    data = b"block data " * 500
    enc = bytearray(encode_block(data))
    struct.pack_into("<i", enc, 4, len(data) + 12345)
    with pytest.raises(Bz3Error):
        decode_block(bytes(enc), len(data), BS)


def test_decode_insane_stage_sizes():
    data = b"block data " * 500
    enc = bytearray(encode_block(data))
    model = enc[8]
    if model & 2:
        struct.pack_into("<i", enc, 9, 2**30)
        with pytest.raises(Bz3Error):
            decode_block(bytes(enc), len(data), BS)


def test_decode_garbage_fuzz():
    rng2 = random.Random(0xFE)
    for _ in range(200):
        blob = bytes(rng2.randrange(256) for _ in range(rng2.randrange(1, 200)))
        try:
            decode_block(blob, rng2.randrange(0, 2 * BS), BS)
        except Bz3Error:
            pass


def test_decode_mutated_stream_fuzz():
    data = bytes(rng.randrange(256) for _ in range(300)) * 10
    enc = bytearray(encode_block(data))
    rng3 = random.Random(1)
    for _ in range(60):
        mutated = bytearray(enc)
        for _ in range(rng3.randrange(1, 6)):
            mutated[rng3.randrange(len(mutated))] ^= 1 << rng3.randrange(8)
        try:
            out = decode_block(bytes(mutated), len(data), BS)
            # If it decodes, CRC must have passed; extremely unlikely
            # to both decode and match unless mutation was benign.
            assert isinstance(out, bytes)
        except Bz3Error:
            pass
