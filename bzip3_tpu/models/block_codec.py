"""Block encode/decode orchestration.

Pipeline semantics (reference: bz3_encode_block src/libbz3.c:585-654,
bz3_decode_block src/libbz3.c:656-809):

Encode:   crc32 of the raw block; blocks < 64 bytes are stored literal
with bwt index -1.  Otherwise RLE then LZP are each applied and kept
only when they shrink the data (model bits 4 and 2 respectively), then
BWT, then the CM entropy coder.  Block header layout:

    [crc32:u32le][bwt_idx:u32le][model:u8]([lzp_size:u32le])([rle_size:u32le])

Decode inverts the chain with full untrusted-input hardening: header
bounds, bwt index bound, intermediate-size bounds against the buffer
bound, and the final CRC check.

This module is engine-agnostic: the stage implementations are injected
via an ``engine`` namespace so the same orchestration drives the oracle
(NumPy) engine and the TPU batch engine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..container.bound import (
    BLOCK_SIZE_MIN,
    BLOCK_SIZE_MAX,
    SMALL_BLOCK_THRESHOLD,
    bound,
    validate_block_size,
)
from ..errors import (
    Bz3Error,
    BZ3_ERR_BWT,
    BZ3_ERR_CRC,
    BZ3_ERR_DATA_TOO_BIG,
    BZ3_ERR_DATA_SIZE_TOO_SMALL,
    BZ3_ERR_INIT,
    BZ3_ERR_MALFORMED_HEADER,
    BZ3_ERR_TRUNCATED_DATA,
)
from ..ops import ref as _ref_engine

_U32 = struct.Struct("<I")
_S32 = struct.Struct("<i")


@dataclass
class BlockHeader:
    crc32: int
    bwt_idx: int
    model: int = 0
    lzp_size: int = -1
    rle_size: int = -1

    @property
    def is_literal(self) -> bool:
        return self.bwt_idx == -1

    def header_size(self) -> int:
        if self.is_literal:
            return 8
        n = 9
        if self.model & 2:
            n += 4
        if self.model & 4:
            n += 4
        return n


def parse_block_header(block: bytes) -> BlockHeader:
    """Parse and bound-check a block header prefix."""
    if len(block) < 8:
        raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL, "block shorter than header")
    crc = _U32.unpack_from(block, 0)[0]
    bwt_idx = _S32.unpack_from(block, 4)[0]
    if bwt_idx == -1:
        return BlockHeader(crc, -1)
    if len(block) < 9:
        raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL, "block shorter than header")
    model = block[8]
    hdr = BlockHeader(crc, bwt_idx, model)
    off = 9
    if model & 2:
        if len(block) < off + 4:
            raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL, "missing lzp size")
        hdr.lzp_size = _S32.unpack_from(block, off)[0]
        off += 4
    if model & 4:
        if len(block) < off + 4:
            raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL, "missing rle size")
        hdr.rle_size = _S32.unpack_from(block, off)[0]
        off += 4
    return hdr


def encode_block(data: bytes, engine=_ref_engine) -> bytes:
    """Encode one block; returns header + payload (no chunk header)."""
    crc = engine.crc32(data)
    n = len(data)

    if n < SMALL_BLOCK_THRESHOLD:
        return _U32.pack(crc) + _S32.pack(-1) + data

    model = 0
    lzp_size = -1
    rle_size = -1
    cur = data

    rle_out = engine.rle_encode(cur)
    if len(rle_out) < len(cur):
        cur = rle_out
        rle_size = len(rle_out)
        model |= 4

    lzp_out = engine.lzp_encode(cur)
    if lzp_out is not None and len(lzp_out) < len(cur):
        cur = lzp_out
        lzp_size = len(lzp_out)
        model |= 2

    bwt_out, bwt_idx = engine.bwt_forward(cur)
    if bwt_idx < 0:
        raise Bz3Error(BZ3_ERR_BWT)

    payload = engine.cm_encode(bwt_out)

    header = bytearray(_U32.pack(crc) + _S32.pack(bwt_idx))
    header.append(model)
    if model & 2:
        header += _S32.pack(lzp_size)
    if model & 4:
        header += _S32.pack(rle_size)
    return bytes(header) + payload


def decode_block(
    block: bytes,
    orig_size: int,
    block_size: int,
    engine=_ref_engine,
    buffer_size: int | None = None,
) -> bytes:
    """Decode one block (without chunk header) to orig_size bytes.

    ``buffer_size`` models the reference's caller-provided scratch bound
    (defaults to bound(block_size)); every hardening check of
    src/libbz3.c:656-809 is mirrored.
    """
    if buffer_size is None:
        buffer_size = bound(block_size)
    compressed_size = len(block)
    if buffer_size < 9 or buffer_size < compressed_size:
        raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL)
    if compressed_size > bound(block_size) or compressed_size < 0:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
    if len(block) < 8:
        raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL, "block shorter than header")

    hdr = parse_block_header(block)

    if hdr.is_literal:
        if compressed_size - 8 > 64 or compressed_size < 8:
            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
        if compressed_size - 8 > buffer_size:
            raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL)
        data = block[8:]
        if engine.crc32(data) != hdr.crc32:
            raise Bz3Error(BZ3_ERR_CRC)
        return data

    if (hdr.model & 2 and not (0 <= hdr.lzp_size <= bound(block_size))) or (
        hdr.model & 4 and not (0 <= hdr.rle_size <= bound(block_size))
    ):
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
    if orig_size > bound(block_size) or orig_size < 0:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)

    if hdr.model & 2:
        size_before_bwt = hdr.lzp_size
    elif hdr.model & 4:
        size_before_bwt = hdr.rle_size
    else:
        size_before_bwt = orig_size

    # Buffer-capacity modeling of every intermediate (libbz3.c:114-122).
    for sz in (hdr.lzp_size, hdr.rle_size, orig_size):
        if sz >= 0 and sz > buffer_size:
            raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL)

    payload = block[hdr.header_size() :]

    bwt_data = engine.cm_decode(payload, size_before_bwt)

    if hdr.bwt_idx > size_before_bwt:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)

    cur = engine.bwt_inverse(bwt_data, hdr.bwt_idx)
    if cur is None:
        raise Bz3Error(BZ3_ERR_BWT)

    if hdr.model & 2:
        cur = engine.lzp_decode(cur, bound(block_size))
        if cur is None:
            raise Bz3Error(BZ3_ERR_CRC)
        if len(cur) > buffer_size:
            raise Bz3Error(BZ3_ERR_DATA_SIZE_TOO_SMALL)

    if hdr.model & 4:
        cur = engine.rle_decode(cur, orig_size)
        if cur is None:
            raise Bz3Error(BZ3_ERR_CRC)

    if len(cur) > block_size:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)

    if engine.crc32(cur) != hdr.crc32:
        raise Bz3Error(BZ3_ERR_CRC)
    return cur


def decode_block_recover(
    block: bytes, orig_size: int, block_size: int, engine=_ref_engine
) -> tuple[bytes, bool]:
    """Best-effort decode for recover mode (src/main.c:279-299).

    Returns ``(data, ok)``.  On failure ``data`` is whatever the stage
    pipeline produced before the failing check — the reference writes
    the partially decoded buffer as-is ("Writing invalid block",
    main.c:293-296) — truncated/zero-padded to ``orig_size``.
    """
    try:
        return decode_block(block, orig_size, block_size, engine), True
    except Bz3Error:
        pass

    cap = bound(block_size)
    orig_size = max(0, min(orig_size, cap))
    best = b""
    try:
        hdr = parse_block_header(block)
        if hdr.is_literal:
            best = block[8 : 8 + 64]
        else:
            if hdr.model & 2:
                sbb = hdr.lzp_size
            elif hdr.model & 4:
                sbb = hdr.rle_size
            else:
                sbb = orig_size
            sbb = max(0, min(sbb, cap))
            payload = block[hdr.header_size() :]
            best = engine.cm_decode(payload, sbb)
            if 0 <= hdr.bwt_idx <= len(best):
                cur = engine.bwt_inverse(best, hdr.bwt_idx)
                if cur is not None:
                    best = cur
            if hdr.model & 2:
                cur = engine.lzp_decode(best, cap)
                if cur is not None:
                    best = cur
            if hdr.model & 4:
                cur = engine.rle_decode(best, orig_size)
                if cur is not None:
                    best = cur
    except Exception:
        pass
    data = best[:orig_size]
    if len(data) < orig_size:
        data = data + b"\x00" * (orig_size - len(data))
    return data, False


class Bz3Codec:
    """Reusable block codec bound to a block size (cf. bz3_new)."""

    def __init__(self, block_size: int, engine=_ref_engine):
        if not validate_block_size(block_size):
            raise Bz3Error(
                BZ3_ERR_INIT,
                f"block size must be in [{BLOCK_SIZE_MIN}, {BLOCK_SIZE_MAX}]",
            )
        self.block_size = block_size
        self.engine = engine

    def encode_block(self, data: bytes) -> bytes:
        if len(data) > self.block_size:
            raise Bz3Error(BZ3_ERR_DATA_TOO_BIG)
        return encode_block(data, self.engine)

    def decode_block(self, block: bytes, orig_size: int, buffer_size=None) -> bytes:
        return decode_block(
            block, orig_size, self.block_size, self.engine, buffer_size
        )
