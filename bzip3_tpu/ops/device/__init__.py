"""Device (JAX/XLA/Pallas) stage implementations.

Batched, fixed-shape kernels:

- crc32_batch      — lane-parallel CRC-32C with GF(2) combine
- bwt_forward_batch / bwt_inverse_batch — prefix-doubling suffix sort /
  segmented parallel LF-chain walk
- cm_encode_batch / cm_decode_batch — lane-interleaved context-mixing
  range coder

plus a scalar engine namespace (`engine`) satisfying the same API as
``bzip3_tpu.ops.ref`` so the block orchestrator can run stage-for-stage
on device.  The scalar engine pads each block to a bucketed shape to
bound recompilation; the batched pipeline in ``bzip3_tpu.pipeline`` is
the intended high-throughput path.

All four stage codecs have device implementations: LZP runs as a
scalar-unit Pallas state machine (lzp_pallas.py, VMEM-resident LUT and
block) and RLE as batched XLA kernels (rle.py); the pipeline chains
them on device under BZ3_TPU_DEVICE_PREPASS=1 (pipeline.encode_core_full).
The single-block convenience wrappers below keep the host oracle for
LZP (the batched kernel is the device path; a per-block host call is
what the scalar engine callers want).
"""

import numpy as np
import jax.numpy as jnp

import jax as _jax

from .crc32 import crc32_batch, crc32
from .crc32_pallas import crc32_batch_pallas


def crc32_batch_auto(data, lengths):
    """Pallas kernel on TPU backends, XLA lane scan elsewhere."""
    if _jax.default_backend() not in ("cpu",):
        return crc32_batch_pallas(data, lengths)
    return crc32_batch(data, lengths)
from .bwt import bwt_forward_batch, bwt_inverse_batch
from .cm import cm_encode_batch, cm_decode_batch

from .rle import rle_encode_batch, rle_decode_batch
from .lzp_pallas import lzp_encode_pallas_batch, lzp_decode_pallas_batch
from ..ref.lzp import lzp_encode, lzp_decode  # per-block host wrapper (see docstring)

__all__ = [
    "crc32_batch",
    "bwt_forward_batch",
    "bwt_inverse_batch",
    "cm_encode_batch",
    "cm_decode_batch",
    "crc32",
    "bwt_forward",
    "bwt_inverse",
    "cm_encode",
    "cm_decode",
    "lzp_encode",
    "lzp_decode",
    "rle_encode",
    "rle_decode",
]


def _bucket(n: int) -> int:
    """Pad size to a power of two (>= 64) to bound jit recompilation."""
    b = 64
    while b < n:
        b <<= 1
    return b


def _pad1(data: bytes):
    n = len(data)
    w = _bucket(max(1, n))
    arr = np.zeros((1, w), dtype=np.uint8)
    arr[0, :n] = np.frombuffer(data, dtype=np.uint8)
    return jnp.asarray(arr), jnp.asarray(np.array([n], np.int32))


def bwt_forward(data: bytes):
    n = len(data)
    if n <= 1:
        return data, n
    arr, lens = _pad1(data)
    u, idx = bwt_forward_batch(arr, lens)
    return np.asarray(u)[0, :n].tobytes(), int(idx[0])


def bwt_inverse(u: bytes, index: int):
    n = len(u)
    if n <= 1:
        return u if index == n else None
    if index <= 0 or index > n:
        return None
    arr, lens = _pad1(u)
    out = bwt_inverse_batch(arr, lens, jnp.asarray(np.array([index], np.int32)))
    return np.asarray(out)[0, :n].tobytes()


def cm_encode(data: bytes) -> bytes:
    arr, lens = _pad1(data)
    out, optr = cm_encode_batch(arr, lens)
    return np.asarray(out)[0, : int(optr[0])].tobytes()


def cm_decode(data: bytes, out_len: int) -> bytes:
    w = _bucket(max(1, out_len))
    arr, lens = _pad1(data)
    out = cm_decode_batch(
        arr, lens, jnp.asarray(np.array([out_len], np.int32)), w
    )
    return np.asarray(out)[0, :out_len].tobytes()


def rle_encode(data: bytes) -> bytes:
    arr, lens = _pad1(data)
    out, olen = rle_encode_batch(arr, lens)
    n = int(olen[0])
    if n > out.shape[1]:
        # Expanding stream truncated by the fixed output width; callers
        # only use RLE when it shrinks, so return an expanding marker
        # of the true length (matches mrlec gain semantics).
        return b"\x00" * n
    return np.asarray(out)[0, :n].tobytes()


def rle_decode(data: bytes, out_len: int) -> bytes | None:
    w = _bucket(max(1, out_len))
    arr, lens = _pad1(data)
    out, ok = rle_decode_batch(
        arr, lens, jnp.asarray(np.array([out_len], np.int32)), w
    )
    if not bool(ok[0]):
        return None
    return np.asarray(out)[0, :out_len].tobytes()
