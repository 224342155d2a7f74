"""bzip3_tpu — a TPU-native lossless block codec with bzip3's capabilities.

A from-scratch JAX/XLA/Pallas implementation of the BZ3v1 format
(reference: kspalaiologos/bzip3). The pipeline per block is:

    RLE pre-pass -> LZP pre-pass -> BWT -> context-mixing arithmetic coder

(each pre-pass kept only when it shrinks the block), mirrored in reverse
for decode with a CRC32 integrity check.  Blocks are independent, which
is the unit of data parallelism: batches of blocks shard across TPU
chips via ``jax.sharding`` / ``shard_map``.

Public API (mirrors include/libbz3.h of the reference):

- :func:`compress` / :func:`decompress` — one-shot frame API
  (reference: src/libbz3.c:876,935)
- :class:`Bz3Codec` — reusable block encoder/decoder state
  (reference: bz3_new/bz3_encode_block/bz3_decode_block,
  src/libbz3.c:535,585,656)
- :func:`bound` — worst-case compressed size (src/libbz3.c:510)
- :func:`min_memory_needed` (src/libbz3.c:999)
"""

from .version import __version__
from .errors import (
    BZ3_OK,
    BZ3_ERR_OUT_OF_BOUNDS,
    BZ3_ERR_BWT,
    BZ3_ERR_CRC,
    BZ3_ERR_MALFORMED_HEADER,
    BZ3_ERR_TRUNCATED_DATA,
    BZ3_ERR_DATA_TOO_BIG,
    BZ3_ERR_INIT,
    BZ3_ERR_DATA_SIZE_TOO_SMALL,
    Bz3Error,
    strerror,
)
from .container.bound import (
    bound,
    min_memory_needed,
    orig_size_sufficient_for_decode,
    BLOCK_SIZE_MIN,
    BLOCK_SIZE_MAX,
)
from .models.block_codec import Bz3Codec
from .container.frame import compress, decompress
from .container.stream import (
    compress_file,
    decompress_file,
    test_file,
    recover_file,
)

__all__ = [
    "__version__",
    "compress",
    "decompress",
    "compress_file",
    "decompress_file",
    "test_file",
    "recover_file",
    "Bz3Codec",
    "bound",
    "min_memory_needed",
    "orig_size_sufficient_for_decode",
    "BLOCK_SIZE_MIN",
    "BLOCK_SIZE_MAX",
    "Bz3Error",
    "strerror",
    "BZ3_OK",
    "BZ3_ERR_OUT_OF_BOUNDS",
    "BZ3_ERR_BWT",
    "BZ3_ERR_CRC",
    "BZ3_ERR_MALFORMED_HEADER",
    "BZ3_ERR_TRUNCATED_DATA",
    "BZ3_ERR_DATA_TOO_BIG",
    "BZ3_ERR_INIT",
    "BZ3_ERR_DATA_SIZE_TOO_SMALL",
]
