"""One-shot frame API: in-memory compress/decompress.

Frame layout (reference: bz3_compress/bz3_decompress,
src/libbz3.c:876-997; doc/bzip3_format.md):

    "BZ3v1" + block_size:u32le + n_blocks:u32le
    then per block: [compressed_size:u32le][orig_size:u32le][payload]
"""

from __future__ import annotations

import struct

from .bound import KiB, BLOCK_SIZE_MIN, bound, validate_block_size
from ..errors import (
    Bz3Error,
    BZ3_ERR_MALFORMED_HEADER,
    BZ3_ERR_TRUNCATED_DATA,
    BZ3_ERR_DATA_TOO_BIG,
)
from ..models.block_codec import encode_block, decode_block
from ..ops import ref as _ref_engine

MAGIC = b"BZ3v1"
_U32 = struct.Struct("<I")


def compress(data: bytes, block_size: int = 16 * 1024 * 1024, engine=_ref_engine) -> bytes:
    """Compress a whole buffer into a BZ3v1 frame."""
    if block_size > len(data):
        block_size = bound(len(data))
    block_size = max(block_size, 65 * KiB)

    n = len(data)
    n_blocks = (n + block_size - 1) // block_size  # 0 blocks for empty input

    out = bytearray()
    out += MAGIC
    out += _U32.pack(block_size)
    out += _U32.pack(n_blocks)

    # Deliberate divergence: the reference sizes the final block as
    # in_size % block_size (src/libbz3.c:914), which silently DROPS the
    # whole last block when in_size is an exact multiple of block_size
    # (verified against the reference library).  We frame the last
    # block with its true remaining size instead; the stream layout is
    # identical and fully cross-decodable.
    offset = 0
    for i in range(n_blocks):
        size = min(block_size, n - offset)
        chunk = data[offset : offset + size]
        payload = encode_block(chunk, engine)
        out += _U32.pack(len(payload))
        out += _U32.pack(size)
        out += payload
        offset += size
    return bytes(out)


def decompress(data: bytes, engine=_ref_engine, max_output: int | None = None) -> bytes:
    """Decompress a BZ3v1 frame produced by :func:`compress`."""
    if len(data) < 13:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
    if data[:5] != MAGIC:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
    block_size = _U32.unpack_from(data, 5)[0]
    n_blocks = _U32.unpack_from(data, 9)[0]
    if not validate_block_size(block_size):
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)

    out = bytearray()
    pos = 13
    for _ in range(n_blocks):
        if len(data) - pos < 8:
            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
        csize = _U32.unpack_from(data, pos)[0]
        osize = _U32.unpack_from(data, pos + 4)[0]
        # The reference rejects csize > block_size (src/libbz3.c:966),
        # but a near-incompressible block can legitimately exceed the
        # block size by the coder overhead; accept up to bound().
        if csize > 2**31 - 1 or csize > bound(block_size):
            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
        if osize > 2**31 - 1:
            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
        if len(data) - pos < csize + 8:
            raise Bz3Error(BZ3_ERR_TRUNCATED_DATA)
        if max_output is not None and len(out) + osize > max_output:
            raise Bz3Error(BZ3_ERR_DATA_TOO_BIG)
        pos += 8
        block = data[pos : pos + csize]
        out += decode_block(block, osize, block_size, engine)
        pos += csize
    return bytes(out)
