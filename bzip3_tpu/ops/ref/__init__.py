"""Bit-exact oracle implementations of every stage codec.

These are small, readable NumPy/Python programs that define the exact
BZ3v1 stage semantics (matching the behavior of src/libbz3.c in the
reference repo).  They are the ground truth for the TPU kernels and are
also used directly for tiny blocks where device dispatch would dominate.
"""

from .crc32 import crc32
from .rle import rle_encode, rle_decode
from .lzp import lzp_encode, lzp_decode
from .bwt import bwt_forward, bwt_inverse
from .cm import cm_encode, cm_decode

__all__ = [
    "crc32",
    "rle_encode",
    "rle_decode",
    "lzp_encode",
    "lzp_decode",
    "bwt_forward",
    "bwt_inverse",
    "cm_encode",
    "cm_decode",
]
