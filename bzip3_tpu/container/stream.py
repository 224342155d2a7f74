"""Streaming file container: the ``bzip3`` CLI's on-disk format.

Layout (reference: process(), src/main.c:157-482):

    "BZ3v1" + block_size:u32le                      (9-byte file header)
    then per block: [csize:u32le][osize:u32le][payload]

Unlike the frame format there is no block count — the stream ends at
EOF, which is what makes a truncated file decodable up to the cut and
the stream seekable by walking chunk headers.

The encoder reads block_size-sized slices; the decoder validates both
chunk sizes against bound(block_size) before decoding.  ``test`` is
decode without output; ``recover`` decodes what it can, emits
best-effort bytes for failing blocks, and proceeds (src/main.c:279-299).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Callable, Iterator

import sys

from .bound import KiB, MiB, bound, validate_block_size
from ..errors import Bz3Error, BZ3_ERR_MALFORMED_HEADER, BZ3_ERR_TRUNCATED_DATA
from ..models.block_codec import encode_block, decode_block, decode_block_recover
from ..ops import ref as _ref_engine

MAGIC = b"BZ3v1"
_U32 = struct.Struct("<I")


def write_file_header(out: BinaryIO, block_size: int) -> int:
    out.write(MAGIC)
    out.write(_U32.pack(block_size))
    return 9


def read_file_header(inp: BinaryIO, recover: bool = False) -> int:
    sig = inp.read(5)
    if sig != MAGIC:
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER, "invalid signature")
    raw = inp.read(4)
    if len(raw) != 4:
        raise Bz3Error(BZ3_ERR_TRUNCATED_DATA, "short header")
    block_size = _U32.unpack(raw)[0]
    if not validate_block_size(block_size):
        if recover:
            # Recovery mode proceeds with the maximum block size
            # (src/main.c:199-204).
            return 511 * MiB
        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER, "invalid block size in header")
    return block_size


def iter_chunks(inp: BinaryIO, block_size: int) -> Iterator[tuple[int, int, bytes]]:
    """Yield (csize, osize, payload) triples until EOF."""
    cap = bound(block_size)
    while True:
        hdr = inp.read(4)
        if not hdr:
            return
        if len(hdr) != 4:
            raise Bz3Error(BZ3_ERR_TRUNCATED_DATA, "short chunk header")
        csize = _U32.unpack(hdr)[0]
        raw = inp.read(4)
        if len(raw) != 4:
            raise Bz3Error(BZ3_ERR_TRUNCATED_DATA, "short chunk header")
        osize = _U32.unpack(raw)[0]
        if csize > cap or osize > cap:
            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER, "inconsistent chunk header")
        payload = inp.read(csize)
        if len(payload) != csize:
            raise Bz3Error(BZ3_ERR_TRUNCATED_DATA, "short chunk payload")
        yield csize, osize, payload


def compress_file(
    inp: BinaryIO,
    out: BinaryIO,
    block_size: int = 16 * MiB,
    engine=_ref_engine,
    batch_encode: Callable[[list[bytes]], list[bytes]] | None = None,
    batch_size: int = 1,
    feof_block: bool | None = None,
) -> tuple[int, int]:
    """Stream-compress; returns (bytes_read, bytes_written).

    When ``batch_encode`` is given, up to ``batch_size`` blocks are
    gathered and encoded together (the TPU data-parallel path,
    superseding the reference's pthread fan-out at src/libbz3.c:845).

    ``feof_block``: the reference's MULTI-WORKER loop reads BEFORE
    checking feof (src/main.c:351-362; feof is only set by a failed or
    short read), so with `-j >= 2` an input that is an exact multiple
    of the block size gets one trailing EMPTY block and an empty input
    gets one empty block — while the single-thread loop
    (src/main.c:237-255) emits neither.  Verified against the compiled
    reference binary on exact-multiple/empty/short files at -j 1/2/4.
    Byte-identity requires mirroring the quirk per the USER'S -j flag,
    independent of our internal batching width; None derives it from
    batch_size for library callers."""
    bytes_read = 0
    bytes_written = write_file_header(out, block_size)

    def emit(payload: bytes, osize: int):
        nonlocal bytes_written
        out.write(_U32.pack(len(payload)))
        out.write(_U32.pack(osize))
        out.write(payload)
        bytes_written += 8 + len(payload)

    pending: list[bytes] = []

    def flush():
        if not pending:
            return
        if batch_encode is not None:
            payloads = batch_encode(pending)
        else:
            payloads = [encode_block(b, engine) for b in pending]
        for orig, payload in zip(pending, payloads):
            emit(payload, len(orig))
        pending.clear()

    if feof_block is None:
        feof_block = batch_size >= 2
    while True:
        chunk = inp.read(block_size)
        if not chunk and not feof_block:
            break
        bytes_read += len(chunk)
        pending.append(chunk)
        if len(pending) >= max(1, batch_size):
            flush()
        if len(chunk) < block_size:
            break
    flush()
    return bytes_read, bytes_written


def decompress_file(
    inp: BinaryIO,
    out: BinaryIO | None,
    engine=_ref_engine,
    recover: bool = False,
    test_only: bool = False,
    batch_decode: Callable[[list[tuple[bytes, int]], int], list[bytes]] | None = None,
    batch_size: int = 1,
) -> tuple[int, int]:
    """Stream-decompress / test / recover; returns (read, written).

    ``batch_decode(pairs, block_size)`` receives the block size parsed
    from the file header (not a caller guess).
    """
    block_size = read_file_header(inp, recover=recover)
    bytes_read = 9
    bytes_written = 0

    pending: list[tuple[bytes, int]] = []

    def decode_one(payload: bytes, osize: int) -> bytes:
        return decode_block(payload, osize, block_size, engine)

    def recover_one(payload: bytes, osize: int) -> bytes:
        # Fast path first (a healthy block in a damaged stream decodes
        # through the configured engine); best-effort partial bytes
        # otherwise — matching the reference, which writes whatever the
        # decode left in the buffer ("Writing invalid block",
        # src/main.c:293-296).
        if batch_decode is not None:
            try:
                return batch_decode([(payload, osize)], block_size)[0]
            except Bz3Error:
                pass
        data, ok = decode_block_recover(payload, osize, block_size, engine)
        if not ok:
            print("bzip3: Writing invalid block.", file=sys.stderr)
        return data

    def flush():
        nonlocal bytes_written
        if not pending:
            return
        if batch_decode is not None and not recover:
            results = batch_decode(list(pending), block_size)
        elif batch_decode is not None and recover:
            try:
                results = batch_decode(list(pending), block_size)
            except Bz3Error:
                results = [recover_one(p, o) for p, o in pending]
        else:
            results = []
            for payload, osize in pending:
                try:
                    results.append(decode_one(payload, osize))
                except Bz3Error:
                    if not recover:
                        raise
                    results.append(recover_one(payload, osize))
        for (_, osize), data in zip(pending, results):
            if out is not None and not test_only:
                out.write(data[:osize])
                bytes_written += min(len(data), osize)
            else:
                bytes_written += osize
        pending.clear()

    for csize, osize, payload in iter_chunks(inp, block_size):
        bytes_read += 8 + csize
        pending.append((payload, osize))
        if len(pending) >= max(1, batch_size):
            flush()
    flush()
    return bytes_read, bytes_written


def test_file(inp: BinaryIO, engine=_ref_engine) -> tuple[int, int]:
    return decompress_file(inp, None, engine, test_only=True)


def recover_file(inp: BinaryIO, out: BinaryIO, engine=_ref_engine) -> tuple[int, int]:
    return decompress_file(inp, out, engine, recover=True)
