"""Pallas TPU kernel for the CRC32 lane scan.

The byte-serial recurrence crc = T[(crc ^ b) & 0xFF] ^ (crc >> 8) uses
one SHARED 256-entry table, so it vectorizes perfectly onto TPU lanes
with `tpu.dynamic_gather` (exposed as take_along_axis along the lane
axis): the table's two 128-entry halves are broadcast across sublanes
and every step gathers 8x128 lane indices in two ops + a select.

The kernel runs the whole SEG-step scan for L lanes in VMEM registers
(the crc state never touches HBM), iterating seg-chunks sequentially in
the grid's second dimension with the state carried in the output ref.
The GF(2) lane-combine and zero-pad unwind stay in XLA (crc32.py).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gf2


def _tbl_halves():
    t = np.asarray(gf2.CRC_TABLE, dtype=np.int32)
    lo = np.broadcast_to(t[:128], (8, 128)).copy()
    hi = np.broadcast_to(t[128:], (8, 128)).copy()
    return jnp.asarray(lo), jnp.asarray(hi)


def _gather_shared(tbl_lo, tbl_hi, idx):
    """T[idx] for idx [S, 128] in [0, 256) with a shared table."""
    s = idx.shape[0]
    lo = jnp.broadcast_to(tbl_lo[:1], (s, 128))
    hi = jnp.broadcast_to(tbl_hi[:1], (s, 128))
    low_idx = jnp.minimum(idx, 127)
    high_idx = jnp.minimum(jnp.maximum(idx - 128, 0), 127)
    vlo = jnp.take_along_axis(lo, low_idx, axis=1)
    vhi = jnp.take_along_axis(hi, high_idx, axis=1)
    return jnp.where(idx < 128, vlo, vhi)


def _make_crc_kernel(seg: int):
    """seg = true segment length; steps past it are pad and must not
    touch the state (a zero byte is NOT a CRC identity)."""

    def _crc_kernel(data_ref, tbl_lo_ref, tbl_hi_ref, out_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        tbl_lo = tbl_lo_ref[...]
        tbl_hi = tbl_hi_ref[...]
        seg_c = data_ref.shape[1]
        base = c * seg_c

        def body(s, crc):
            b = data_ref[0, s].astype(jnp.int32)  # [S8, 128]
            idx = (crc ^ b) & 0xFF
            t = _gather_shared(tbl_lo, tbl_hi, idx)
            nxt = t ^ jax.lax.shift_right_logical(crc, 8)
            return jnp.where(base + s < seg, nxt, crc)

        crc0 = out_ref[0]
        crc = jax.lax.fori_loop(0, seg_c, body, crc0)
        out_ref[0] = crc

    return _crc_kernel


@partial(jax.jit, static_argnames=("seg_chunk", "interpret"))
def crc_lane_scan_pallas(stream: jax.Array, seg_chunk: int = 512, interpret: bool = False):
    """Lane CRC states with init 0.

    stream: [K, SEG, S8, 128] uint8 (lane l = s8*128+v owns contiguous
    bytes of its segment, byte s at stream[k, s, s8, v]).
    Returns [K, S8, 128] int32 lane states.
    """
    k_dim, seg, s8, _ = stream.shape
    n_chunks = -(-seg // seg_chunk)
    if n_chunks * seg_chunk != seg:
        stream = jnp.pad(stream, ((0, 0), (0, n_chunks * seg_chunk - seg), (0, 0), (0, 0)))
    tbl_lo, tbl_hi = _tbl_halves()

    grid = (k_dim, n_chunks)
    out = pl.pallas_call(
        _make_crc_kernel(seg),
        out_shape=jax.ShapeDtypeStruct((k_dim, s8, 128), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, seg_chunk, s8, 128),
                lambda k, c: (k, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 128), lambda k, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda k, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s8, 128), lambda k, c: (k, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(stream, tbl_lo, tbl_hi)
    return out


def crc32_batch_pallas(
    data: jax.Array, lengths: jax.Array, lanes: int = 2048, interpret: bool = False
):
    """Drop-in batched CRC32 using the Pallas lane scan.

    Semantics identical to crc32.crc32_batch.
    """
    from .crc32 import _lane_combine_bank, _apply_bank, _xor_reduce

    k_dim, n = data.shape
    lanes = min(lanes, max(128, n))
    lanes = max(128, (lanes // 128) * 128)
    seg = -(-n // lanes)
    padded_n = lanes * seg
    if padded_n != n:
        data = jnp.pad(data, ((0, 0), (0, padded_n - n)))

    s8 = lanes // 128
    # lane l owns bytes [l*seg, (l+1)*seg); stream[k, s, s8, v] = byte s
    # of lane s8*128+v.
    stream = data.reshape(k_dim, s8, 128, seg).transpose(0, 3, 1, 2)
    lane_crc = crc_lane_scan_pallas(stream, interpret=interpret)  # [K, S8, 128] i32
    lane_crc = jax.lax.bitcast_convert_type(
        lane_crc.reshape(k_dim, lanes), jnp.uint32
    )

    comb = _lane_combine_bank(lanes, seg)
    merged = _xor_reduce(_apply_bank(jnp.asarray(comb), lane_crc), (1,))

    init_term = np.uint32(gf2._apply(gf2.shift_matrix(padded_n), 1))
    crc_full = merged ^ init_term

    pad = (jnp.int32(padded_n) - lengths).astype(jnp.uint32)
    max_bits = max(1, int(padded_n).bit_length())
    bank = jnp.asarray(gf2.unshift_pow2_bank(max_bits))

    def unwind(j, crc):
        hit = ((pad >> j.astype(jnp.uint32)) & jnp.uint32(1)).astype(bool)
        return jnp.where(hit, _apply_bank(bank[j], crc), crc)

    return jax.lax.fori_loop(0, max_bits, unwind, crc_full)
