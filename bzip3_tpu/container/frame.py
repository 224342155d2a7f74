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

# Sentinel: pick the fastest available engine (native pool if the
# shared library loads, else the serial oracle).
AUTO = object()


def _auto_batch(kind: str):
    """Best-available batch callable for `kind` in {"encode","decode"},
    or None when only the oracle is available."""
    try:
        from ..engines import get_engine

        eng = get_engine("native")
    except Exception:
        return None
    if kind == "encode":
        return lambda blocks: eng.encode_blocks(blocks)
    return lambda pairs, block_size: eng.decode_blocks(pairs, block_size)


def compress(
    data: bytes,
    block_size: int = 16 * 1024 * 1024,
    engine=AUTO,
    batch_encode=None,
    batch_size: int = 16,
) -> bytes:
    """Compress a whole buffer into a BZ3v1 frame.

    ``batch_encode(blocks) -> payloads`` routes the per-block work
    through a batch engine (native pthread pool / TPU pipeline, see
    bzip3_tpu.engines); the default resolves to the native pool when
    its shared library is available, else the serial oracle (matching
    the reference's single-threaded bz3_compress, src/libbz3.c:876).
    """
    if engine is AUTO:
        engine = _ref_engine
        if batch_encode is None:
            batch_encode = _auto_batch("encode")
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
    chunks = [data[o : o + block_size] for o in range(0, n, block_size)]
    for lo in range(0, n_blocks, max(1, batch_size)):
        batch = chunks[lo : lo + max(1, batch_size)]
        if batch_encode is not None:
            payloads = batch_encode(batch)
        else:
            payloads = [encode_block(c, engine) for c in batch]
        for chunk, payload in zip(batch, payloads):
            out += _U32.pack(len(payload))
            out += _U32.pack(len(chunk))
            out += payload
    return bytes(out)


def decompress(
    data: bytes,
    engine=AUTO,
    max_output: int | None = None,
    batch_decode=None,
    batch_size: int = 16,
) -> bytes:
    """Decompress a BZ3v1 frame produced by :func:`compress`.

    ``batch_decode(pairs, block_size) -> blocks`` routes decoding
    through a batch engine; pairs are (payload, orig_size).  The
    default resolves to the native pool when available (see
    :func:`compress`).
    """
    if engine is AUTO:
        engine = _ref_engine
        if batch_decode is None:
            batch_decode = _auto_batch("decode")
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
    pending: list[tuple[bytes, int]] = []
    total_osize = 0
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
        total_osize += osize
        if max_output is not None and total_osize > max_output:
            raise Bz3Error(BZ3_ERR_DATA_TOO_BIG)
        pos += 8
        pending.append((data[pos : pos + csize], osize))
        pos += csize

    for lo in range(0, len(pending), max(1, batch_size)):
        batch = pending[lo : lo + max(1, batch_size)]
        if batch_decode is not None:
            results = batch_decode(batch, block_size)
        else:
            results = [decode_block(b, o, block_size, engine) for b, o in batch]
        for blk in results:
            out += blk
    return bytes(out)
