"""Batched CRC32 on device.

Computes the BZ3v1 checksum (reflected CRC-32C, init 1, no final xor —
reference: src/libbz3.c:37-72, crc32sum) for a batch of padded blocks
in one fixed-shape XLA program:

1. each [K, N] uint8 batch is reshaped to [K, L, SEG] lanes and every
   lane runs the byte-serial table recurrence with init 0 — the scan is
   sequential in SEG but vector-wide over K*L lanes (VPU work);
2. lane states are merged with constant GF(2) shift matrices
   (Z**(bytes after lane), see gf2.py) — the zlib crc32_combine trick;
3. the zero padding beyond each block's true length is undone by
   applying (Z**-1) conditioned on the bits of the pad length.

The result is bit-exact with the reference for any length, including 0.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import gf2

_LANES = 2048  # lane count: SEG = ceil(N / _LANES) sequential steps


def _xor_reduce(x, axes):
    """XOR-reduce over the given axes by log-step halving.

    (jax.lax.reduce with a custom combinator deadlocks on some backends,
    so this stays on plain elementwise ops.)
    """
    for ax in sorted(axes, reverse=True):
        x = jnp.moveaxis(x, ax, -1)
        n = x.shape[-1]
        while n > 1:
            half = n // 2
            folded = x[..., :half] ^ x[..., half : 2 * half]
            if n % 2:
                folded = folded.at[..., 0].set(folded[..., 0] ^ x[..., n - 1])
            x = folded
            n = half
        x = x[..., 0]
    return x


def _apply_bank(bank, v):
    """Apply per-element 32x32 GF(2) matrices to uint32 states.

    bank: [..., 32] uint32 column banks broadcastable against v[..., None]
    v:    [...] uint32
    """
    bits = (v[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    terms = jnp.where(bits.astype(bool), bank, jnp.uint32(0))
    return _xor_reduce(terms, (terms.ndim - 1,))


_BANK_CACHE = {}


def _lane_combine_bank(lanes: int, seg: int) -> np.ndarray:
    key = (lanes, seg)
    if key not in _BANK_CACHE:
        z_seg = gf2.shift_matrix(seg)
        bank = np.empty((lanes, 32), dtype=np.uint32)
        bank[lanes - 1] = gf2.matrix_of(lambda v: v)
        for l in range(lanes - 2, -1, -1):
            bank[l] = gf2.mat_mul(z_seg, bank[l + 1])
        _BANK_CACHE[key] = bank
    return _BANK_CACHE[key]


@partial(jax.jit, static_argnames=("lanes",))
def crc32_batch(data: jax.Array, lengths: jax.Array, lanes: int = _LANES):
    """CRC32 of each row of ``data[k, :lengths[k]]``.

    data: [K, N] uint8, zero-padded past lengths.
    lengths: [K] int32.
    returns [K] uint32.
    """
    k_dim, n = data.shape
    lanes = min(lanes, max(1, n))
    seg = -(-n // lanes)
    padded_n = lanes * seg
    if padded_n != n:
        data = jnp.pad(data, ((0, 0), (0, padded_n - n)))

    table = jnp.asarray(gf2.CRC_TABLE)
    # [SEG, K, L] so the scan walks the byte axis.
    stream = data.reshape(k_dim, lanes, seg).transpose(2, 0, 1)

    def step(crc, b):
        idx = ((crc ^ b.astype(jnp.uint32)) & jnp.uint32(0xFF)).astype(jnp.int32)
        return jnp.take(table, idx) ^ (crc >> jnp.uint32(8)), None

    init = jnp.zeros((k_dim, lanes), dtype=jnp.uint32)
    lane_crc, _ = jax.lax.scan(step, init, stream)

    # Merge lanes: lane l is followed by (lanes-1-l)*seg bytes.  Built
    # incrementally (comb[l-1] = Z**seg @ comb[l]) — one mat_pow total.
    comb = _lane_combine_bank(lanes, seg)  # [L, 32]
    merged = _xor_reduce(_apply_bank(jnp.asarray(comb), lane_crc), (1,))  # [K]

    # Initial value 1 shifted past all padded bytes is a constant.
    init_term = np.uint32(gf2._apply(gf2.shift_matrix(padded_n), 1))
    crc_full = merged ^ init_term

    # Undo the zero padding: apply Z**-pad via the pow2 bank.
    pad = (jnp.int32(padded_n) - lengths).astype(jnp.uint32)
    max_bits = max(1, int(padded_n).bit_length())
    bank = jnp.asarray(gf2.unshift_pow2_bank(max_bits))  # [B, 32]

    def unwind(j, crc):
        hit = ((pad >> j.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        return jnp.where(hit, _apply_bank(bank[j], crc), crc)

    crc = jax.lax.fori_loop(0, max_bits, unwind, crc_full)
    return crc


def crc32(data, crc: int = 1) -> int:
    """Scalar convenience wrapper (engine API parity with ops.ref)."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    n = len(buf)
    if crc != 1:
        raise NotImplementedError("device crc32 only supports init=1")
    if n == 0:
        return 1
    arr = jnp.asarray(buf)[None, :]
    out = crc32_batch(arr, jnp.array([n], dtype=jnp.int32))
    return int(out[0])
