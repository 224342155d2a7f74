"""CRC32 oracle.

BZ3v1 uses a reflected CRC-32C (Castagnoli) byte-at-a-time checksum with
initial value 1 and *no* final inversion (reference: src/libbz3.c:37-72,
called as crc32sum(1, buf, n) at src/libbz3.c:593).

The 256-entry table is generated from the reflected Castagnoli
polynomial 0x82F63B78 rather than hard-coded.
"""

import numpy as np

_POLY = np.uint32(0x82F63B78)


def _make_table() -> np.ndarray:
    idx = np.arange(256, dtype=np.uint32)
    crc = idx.copy()
    for _ in range(8):
        crc = np.where(crc & 1, (crc >> np.uint32(1)) ^ _POLY, crc >> np.uint32(1))
    return crc


CRC32C_TABLE = _make_table()


def crc32(data, crc: int = 1) -> int:
    """crc = T[(crc ^ byte) & 0xff] ^ (crc >> 8) over all bytes; init 1."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    c = np.uint32(crc)
    tbl = CRC32C_TABLE
    # Process in vector-friendly strides: CRC is a linear recurrence, so
    # fold 8 bytes per python-level step using the standard slice-by-N
    # trick expressed through table composition would be overkill here;
    # plain iteration over a memoryview is fast enough for the oracle.
    for b in buf.tobytes():
        c = tbl[(int(c) ^ b) & 0xFF] ^ (c >> np.uint32(8))
    return int(c)
