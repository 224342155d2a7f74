"""Size bounds and limits for the BZ3v1 format.

Reference semantics: src/libbz3.c:510 (bz3_bound), :536 (block size
limits), :999-1022 (bz3_min_memory_needed), include/common.h:23-25.
"""

KiB = 1024
MiB = 1024 * 1024

BLOCK_SIZE_MIN = 65 * KiB  # 66,560
BLOCK_SIZE_MAX = 511 * MiB  # 535,822,336

# Blocks shorter than this are stored as literals with no entropy coding
# (src/libbz3.c:596).
SMALL_BLOCK_THRESHOLD = 64

LZP_DICTIONARY_BITS = 18
LZP_MIN_MATCH = 40
LZP_MATCH_BYTE = 0xF2


def bound(input_size: int) -> int:
    """Worst-case single-block compressed size: n + n/50 + 32 (~2.03%)."""
    return input_size + input_size // 50 + 32


def bwt_bound(input_size: int) -> int:
    """Index-array bound used by the BWT stage (include/common.h:25)."""
    return bound(input_size) + 128


def validate_block_size(block_size: int) -> bool:
    return BLOCK_SIZE_MIN <= block_size <= BLOCK_SIZE_MAX


def min_memory_needed(block_size: int) -> int:
    """Approximate host/device working set for one block codec lane.

    Mirrors the ~6.17x block size accounting of the reference
    (src/libbz3.c:999-1022): swap buffer + 4-byte rank/index array +
    LZP table + CM model tables.
    """
    if not validate_block_size(block_size):
        return 0
    total = 0
    total += bound(block_size)  # swap buffer
    total += bwt_bound(block_size) * 4  # suffix-rank array (int32)
    total += (1 << LZP_DICTIONARY_BITS) * 4  # LZP hash table
    # CM model tables: C0 (256 u16) + C1 (256*256 u16) + C2 (512*17 u16)
    total += (256 + 256 * 256 + 512 * 17) * 2
    return total


def orig_size_sufficient_for_decode(block: bytes, orig_size: int) -> int:
    """Whether an ``orig_size``-sized buffer suffices to decode ``block``.

    Mirrors bz3_orig_size_sufficient_for_decode (src/libbz3.c:1025-1055)
    including its quirks: returns -1 on malformed/short headers, 1 when
    sufficient, 0 when not.  Note the reference computes the needed
    header length as ``9 + (model & 2) * 4 + (model & 4) * 4`` — i.e. 8
    and 16 extra bytes rather than 4 and 4 — which we reproduce for
    behavioural parity.
    """
    import struct

    if len(block) < 9:
        return -1
    bwt_idx = struct.unpack_from("<i", block, 4)[0]
    if bwt_idx == -1:
        return 1
    model = block[8]
    needed = 9 + (model & 2) * 4 + (model & 4) * 4
    if len(block) < needed:
        return -1
    off = 9
    lzp_size = rle_size = -1
    if model & 2:
        lzp_size = struct.unpack_from("<i", block, off)[0]
        off += 4
    if model & 4:
        rle_size = struct.unpack_from("<i", block, off)[0]
    eff = lambda v: 0 if v < 0 else v
    ok = (
        eff(lzp_size) <= orig_size
        and eff(rle_size) <= orig_size
        and eff(orig_size) <= orig_size
    )
    return 1 if ok else 0
