"""Pallas TPU kernel for the CM entropy coder (encode + decode).

The format's coder (reference src/libbz3.c:331-494) is bit-serial per
block: 8 adaptive binary decisions per byte against mutable tables
C0[256] / C1[256][256] / C2[512][17].  The XLA scan formulation pays a
fixed per-step dispatch/mutation cost on this backend (PERF_NOTES §2);
this kernel instead runs the WHOLE per-block loop on-core with the
tables resident in VMEM, coding L independent blocks ("lanes") in
lockstep — one instruction stream, L blocks of real work per step.

Layout (the whole design):

- CM lane = sublane row.  Every per-lane scalar (low/high/code/ip/
  ctx/...) is a row-constant [L, 128] i32 vreg; per-lane table lookups
  are `take_along_axis` along the 128-lane axis (tpu.dynamic_gather),
  the primitive proven out by the CRC32 kernel (crc32_pallas.py).
- Tables are PAIR-PACKED: counters are < 2**16, so adjacent slots
  (2w, 2w+1) share one i32 word.  Every table width halves (C1 rows
  become one [L, 128] chunk, the C2 windows/blends scan half the
  chunks), and the decode candidates (contexts 2c/2c+1) share one
  C0/C1 gather — the kernel is issue-bound at 8 lanes, so the op cut
  is what buys lane scaling.
- Bit position t bounds the context: ctx ∈ [2^t, 2^(t+1)).  C0 and C2
  are therefore SPLIT PER BIT into separate refs: C0_t holds the 2^t
  counters bit t can touch (single-gather lookups), C2_t holds rows
  [2^(t+1), 2^(t+2)) (34·2^t entries, gathered in 128-lane chunks).
  Splitting also removes false serialization between bits: bit t+1
  never reads a ref bit t wrote.
- C1 rows are cached per byte (rowA = C1[c1], rowB = C1[c2]): the
  byte-serial part fetches two packed 128-word rows per lane per byte
  via scalar-bridged dynamic slices; within the byte all C1 traffic
  hits the cached rows.
- ALL counter updates are deferred to the end of the byte, off the
  bit-serial critical path.  This is exact: within one byte the coder
  reads each C0/C1 slot only at its own tree node (before updating
  it), C2 rows are disjoint across bits (distinct 2ctx+f ranges), and
  x2 = C2[sse+1] never crosses a row because p <= 65535 => j <= 15.
- The range coder runs in i32 with explicit unsigned-compare helpers;
  the reference's 64-bit product ((high-low) * (ssep*3+p)) >> 18 is
  reproduced with 16-bit limb products and carries (_mul_shift18_i32).

Streaming (blocks larger than VMEM stage through HBM).  Mosaic DMA
slices must be sublane-tile aligned, so every per-lane DMA moves one
whole (8, 128) tile — 1 KiB of stream — between HBM (viewed 4-D as
[L, chunks, 8, 128]) and a per-lane 2-slot staging window whose lane
axis is a LEADING (untiled) dim.  On top of that sits a 256-byte
register carry (two [L, 128] vregs) refreshed by 16-chunk gathers when
any lane crosses a 128-byte boundary; the data-dependent per-byte
traffic (decode range refills, encode renorm emissions, <= 32 B per
byte-step) only ever touches the register carry.  The in-lockstep
streams (decode output, encode input) move as plain [L, 128] block
DMAs every 128 steps, double-buffered.

Bit-exactness is enforced against ops/ref/cm.py by tests (interpret
mode on CPU; the same kernel runs compiled on TPU).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
SIGN = np.int32(-0x80000000)  # 1 << 31 as i32


def _ult(a, b):
    """Unsigned 32-bit a < b on i32 vregs."""
    return (a ^ SIGN) < (b ^ SIGN)


def _ule(a, b):
    return (a ^ SIGN) <= (b ^ SIGN)


def _srl(a, n):
    return jax.lax.shift_right_logical(a, jnp.int32(n) if isinstance(n, int) else n)


def _mul_shift18_i32(a, b):
    """floor((u32)a * (u32)b / 2**18) mod 2**32, b < 2**18, in i32 ops.

    Mirrors ops/device/cm._mul_shift18 (reference src/libbz3.c:390:
    ((u64)(high - low) * (ssep * 3 + p)) >> 18).
    """
    a0 = a & 0xFFFF
    a1 = _srl(a, 16)
    b0 = b & 0xFFFF
    b1 = _srl(b, 16)  # < 4
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    cm = _ult(mid, p10).astype(I32)
    s = mid + _srl(p00, 16)
    cs = _ult(s, mid).astype(I32)
    return (p11 << 14) + ((cm + cs) << 30) + _srl(s, 2)


def _mul_limbs_i32(a, b):
    """Exact 64-bit product (u32)a * (u32)b, b < 2**18, as (hi, lo) i32 limbs."""
    a0 = a & 0xFFFF
    a1 = _srl(a, 16)
    b0 = b & 0xFFFF
    b1 = _srl(b, 16)  # < 4
    p10 = a1 * b0
    mid = a0 * b1 + p10
    cm = _ult(mid, p10).astype(I32)
    p00 = a0 * b0
    lo = p00 + (mid << 16)
    cl = _ult(lo, p00).astype(I32)
    hi = a1 * b1 + _srl(mid, 16) + (cm << 16) + cl
    return hi, lo


def _spec_steps(d, s):
    """All five renorm-candidate range steps from ONE wide product.

    After k renormalization shifts the range value is ((d+1)<<8k - 1)
    mod 2**32, so step_k = (that * s) >> 18.  Whenever candidate k is
    the ACTUAL renorm count, the renorm invariant bounds d < 2**(32-8k)
    (low^high < 2**(32-8k) and high-low <= low^high), which makes
    (d+1)<<8k <= 2**32 exact — so step_k = ((d+1)*s*2**8k - s) >> 18
    derives from the single product Q = (d+1)*s by shifts and one
    subtract.  Unselected candidates may hold garbage (the caller's
    select by k discards them).  Replaces five limb multiplies with one
    (the old 5x body blew up both XLA:CPU and Mosaic compile times).
    """
    hi, lo = _mul_limbs_i32(d, s)  # P = d*s exact
    m0 = _srl(lo, 18) + (hi << 14)
    qlo = lo + s  # Q = P + s = (d+1)*s
    qhi = hi + _ult(qlo, lo).astype(I32)
    ms = [m0]
    for k in (1, 2, 3):
        rlo = qlo << (8 * k)
        rhi = (qhi << (8 * k)) + _srl(qlo, 32 - 8 * k)
        bb = _ult(rlo, s).astype(I32)
        ms.append(_srl(rlo - s, 18) + ((rhi - bb) << 14))
    bb = _ult(jnp.zeros_like(s), s).astype(I32)  # k = 4: R = Q << 32
    ms.append(_srl(jnp.zeros_like(s) - s, 18) + ((qlo - bb) << 14))
    return tuple(ms)


def _gather_chunk(tbl, idx):
    """tbl [L, 128], idx [L, 128] in [0, 128) -> tbl[l, idx]."""
    return jnp.take_along_axis(tbl, idx, axis=1)


def _or_tree(parts):
    """Combine [L, 128] vregs of which at most one is nonzero per
    element.  A linear `where` scan is a DEPENDENT select chain (~21 ns
    per level on this backend, PERF_NOTES §0 — the measured cost of the
    C2 window extraction); the masked parts are mutually independent,
    so a balanced OR tree gets log2 depth for the same issue count."""
    parts = list(parts)
    while len(parts) > 1:
        nxt = [parts[i] | parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _gather_wide(tbl, idx):
    """tbl [L, W] (W = k*128), per-lane gather at idx [L, 128].

    Chunk selection via the shared idx>>7 / idx&127 decomposition: the
    in-chunk offset is always idx mod 128, so no clipping is needed.
    Exactly one chunk matches per element (counters are non-negative),
    so the per-chunk masked gathers OR-combine in a log-depth tree."""
    w = tbl.shape[1]
    off = idx & 127
    if w == 128:
        return _gather_chunk(tbl, off)
    hi = _srl(idx, 7)
    return _or_tree(
        jnp.where(hi == k, _gather_chunk(tbl[:, k * 128 : (k + 1) * 128], off), 0)
        for k in range(w // 128)
    )


def _extract2(tbl, cb):
    """Extract chunks cb and cb+1 (per-lane dynamic) of tbl [L, W].

    Returns (e0, e1) [L, 128] vregs.  One masked pass per chunk,
    OR-tree combined (log depth) — the consumer then gathers from just
    these two chunks instead of scanning the whole table per gather."""
    w = tbl.shape[1]
    z = jnp.zeros((tbl.shape[0], 128), tbl.dtype)
    e0p, e1p = [z], [z]
    for k in range(w // 128):
        ch = tbl[:, k * 128 : (k + 1) * 128]
        e0p.append(jnp.where(cb == k, ch, 0))
        e1p.append(jnp.where(cb == k - 1, ch, 0))
    return _or_tree(e0p), _or_tree(e1p)


def _win_pair_gather(e0, e1, cb, idx):
    """Gather from the 2-chunk window (e0 = chunk cb, e1 = chunk cb+1)."""
    off = idx & 127
    return jnp.where(
        _srl(idx, 7) == cb, _gather_chunk(e0, off), _gather_chunk(e1, off)
    )


# ---- packed-pair table layout ---------------------------------------
# Every counter is in [0, 65535], so adjacent table slots (2w, 2w+1)
# pack into one i32 word (low half = even slot).  This halves every
# table's width — C1 rows become a single [L, 128] chunk, the C2
# windows/blends scan half the chunks — and in the decode kernel the
# two speculative candidates (contexts 2c and 2c+1) share ONE gather
# for C0/C1 because they always land in the same packed word.  The
# kernel is issue-bound at 8 lanes (measured: L=16 doubles per-step
# time), so the op-count cut is what buys lane scaling.

_PAIR_INIT = np.int32(-2147450880)  # (1<<15) | (1<<15)<<16 packed
_HI_MASK = np.int32(-65536)  # 0xFFFF0000

# C2 window extraction strategy: 0 = vector _extract2 scan over the
# table's chunks; 1 = per-lane scalar row-slice gathers (the branchless
# rotation's cheap primitives) into a small scratch.  See PERF_NOTES.
_C2SW = os.environ.get("BZ3_TPU_CM_C2SW", "0") == "1"


def _c2_window_scalar(c2t, c2w, scal, c2cb, lanes):
    """Per-lane scalar gather of chunks (cb, cb+1) of c2t [L, W] into
    c2w [2, L, 128].  The dynamic column offsets are 128-aligned by
    construction, which Mosaic accepts as scalar-controlled slices."""
    w = c2t.shape[1]
    scal[0] = c2cb
    for l in range(lanes):
        cbl = scal[0, l, 0]
        off0 = pl.multiple_of(cbl * 128, 128)
        off1 = pl.multiple_of(
            jnp.minimum(cbl * 128 + 128, jnp.int32(w - 128)), 128
        )
        c2w[0, l, :] = c2t[l, pl.ds(off0, 128)]
        c2w[1, l, :] = c2t[l, pl.ds(off1, 128)]
    return c2w[0], c2w[1]


def _half(w, parity):
    """Extract the 16-bit half of packed word w selected by parity&1."""
    return jnp.where((parity & 1) == 0, w & 0xFFFF, _srl(w, 16))


def _set_half(w, parity, v):
    """Replace the (parity&1)-half of packed word w with v < 2**16."""
    return jnp.where((parity & 1) == 0, (w & _HI_MASK) | v, (w & 0xFFFF) | (v << 16))


def _c2_pair_updates(sse, v1, v2, wa, wb):
    """Packed-word updates for C2 slots (sse, sse+1) <- (v1, v2).

    wa/wb are the packed words holding sse and sse+1 as gathered this
    bit (their untouched halves are current: the only slots this bit
    writes are sse and sse+1).  Returns (new_wa, new_wb) for word
    indices sse>>1 and (sse+1)>>1; when sse is even both indices
    coincide and both values equal the fully-new word."""
    even = (sse & 1) == 0
    new_wa = jnp.where(even, v1 | (v2 << 16), (wa & 0xFFFF) | (v1 << 16))
    new_wb = jnp.where(even, new_wa, (wb & _HI_MASK) | v2)
    return new_wa, new_wb


def _blend_wide(value, updates):
    """Apply per-lane single-slot updates to a [L, W] VALUE (pure).

    updates: list of (idx [L,128], val [L,128], mask [L,128]) applied
    in order (later wins)."""
    l_dim, w = value.shape
    col = jax.lax.broadcasted_iota(I32, (l_dim, 128), 1)
    pre = [(mask & (col == (idx & 127)), _srl(idx, 7), val) for idx, val, mask in updates]
    cols = []
    for k in range(w // 128):
        chunk = value[:, k * 128 : (k + 1) * 128]
        for m, hi, val in pre:
            chunk = jnp.where(m & (hi == k), val, chunk)
        cols.append(chunk)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _c2_init(shape):
    """Packed C2 init: word w holds slots (2w, 2w+1) with slot
    (r*17 + k) = (k << 12) - (k == 16), synthesized in-kernel
    (iota + magic /17, exact for idx < 2**20)."""
    wi = jax.lax.broadcasted_iota(I32, shape, 1)

    def slot_val(idx):
        k = idx - 17 * ((idx * 61681) >> 20)
        return (k << 12) - (k == 16).astype(I32)

    return slot_val(2 * wi) | (slot_val(2 * wi + 1) << 16)


def _upd(bit, p0, p1, x1, x2):
    """Counter update values, rates 2/4/6 (src/libbz3.c:347-348)."""
    u0 = jnp.where(bit, p0 + ((p0 ^ 65535) >> 2), p0 - (p0 >> 2))
    u1 = jnp.where(bit, p1 + ((p1 ^ 65535) >> 4), p1 - (p1 >> 4))
    v1 = jnp.where(bit, x1 + ((x1 ^ 65535) >> 6), x1 - (x1 >> 6))
    v2 = jnp.where(bit, x2 + ((x2 ^ 65535) >> 6), x2 - (x2 >> 6))
    return u0, u1, v1, v2


def _init_tables(c0, c1, c2, rowa, rowb):
    for t in range(8):
        c0[t][...] = jnp.full(c0[t].shape, _PAIR_INIT, I32)
        c2[t][...] = _c2_init(c2[t].shape)
    c1[...] = jnp.full(c1.shape, _PAIR_INIT, I32)
    rowa[...] = jnp.full(rowa.shape, _PAIR_INIT, I32)
    rowb[...] = jnp.full(rowb.shape, _PAIR_INIT, I32)


def _rotate_c1_rows(c1, rowa, rowb, scal, c1_old, c1_new, active, lanes):
    """Byte-boundary C1 maintenance: write rowA back to C1[c1_old],
    rowB <- rowA (c2' = c1), rowA <- C1[c1_new].  Per-lane scalar
    control via the VMEM scalar bridge.

    The copies run UNCONDITIONALLY: a cost-split ablation on chip
    (PERF_NOTES R3.11) showed the former `@pl.when(switching)` guard
    regions — not the row copies they guarded — were the entire ~46%
    rotation share of the decode step (skip-write-back measured 0;
    branchless measured +38%, within 6% of removing the rotation
    outright).  Unconditional is also EXACT: for non-switching or
    inactive lanes c1_old == c1_new, so the pair degenerates to
    write-back + refetch of the same row."""
    act_mask = jnp.broadcast_to(active[:, :1], rowb.shape)
    rowb[...] = jnp.where(act_mask, rowa[...], rowb[...])
    scal[0] = c1_old | (c1_new << 8)
    for l in range(lanes):
        w = scal[0, l, 0]
        c1[l, w & 255, :] = rowa[l, :]
        rowa[l, :] = c1[l, _srl(w, 8) & 255, :]


def _win_gather(win, lanes, base):
    """Refresh the 384-byte register carry from the [2, L, 8, 128]
    staging window: returns three [L, 128] chunks = window bytes
    [base, base+384).  The window holds absolute bytes [fh-2048, fh)
    at slot (a>>10)&1, sub (a>>7)&7, lane a&127."""
    col = jax.lax.broadcasted_iota(I32, (lanes, 128), 1)
    outs = []
    for part in range(3):
        idx = base + part * 128 + col  # absolute byte positions
        sel = _srl(idx, 7) & 15  # (slot, sub) combined
        outs.append(
            _or_tree(
                jnp.where(
                    sel == s, _gather_chunk(win[s >> 3, :, s & 7, :], idx & 127), 0
                )
                for s in range(16)
            )
        )
    return tuple(outs)


def _gather3(w0, w1, w2, rel):
    """Gather from the 384-deep three-vreg carry, rel in [0, 384)."""
    off = rel & 127
    hi = _srl(rel, 7)
    return (
        jnp.where(hi == 0, _gather_chunk(w0, off), 0)
        | jnp.where(hi == 1, _gather_chunk(w1, off), 0)
    ) | jnp.where(hi == 2, _gather_chunk(w2, off), 0)


def _shl8k(x, k):
    """x << 8k for k in [0, 4] (k == 4 -> 0), 3-level select tree."""
    a = jnp.where((k & 1) != 0, x << 8, x)
    b = jnp.where((k & 2) != 0, a << 16, a)
    return jnp.where(k == 4, 0, b)


def _mask8k(k):
    """(1 << 8k) - 1 for k in [0, 4] as i32."""
    m = jnp.where((k & 1) != 0, jnp.int32(0xFF), jnp.int32(0))
    m = jnp.where((k & 2) != 0, (m << 16) | 0xFFFF, m)
    return jnp.where(k == 4, jnp.int32(-1), m)


def _renorm_count(lh, active):
    """Number of renormalization steps for range value lh = low ^ high.

    The loop `while ((low^high) < 2**24) shift` runs exactly
    [lh <u 2**24] + [lh <u 2**16] + [lh <u 2**8] + [lh == 0] times
    (after j shifts the value is lh<<8j | (2**8j - 1)) — all four
    compares are data-parallel, so the serial renorm loop collapses to
    a popcount-style sum."""
    k = (
        _ult(lh, jnp.int32(1 << 24)).astype(I32)
        + _ult(lh, jnp.int32(1 << 16)).astype(I32)
        + _ult(lh, jnp.int32(1 << 8)).astype(I32)
        + (lh == 0).astype(I32)
    )
    return jnp.where(active, k, 0)


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------


def _ablate() -> str:
    """Measurement-only kernel ablations (BZ3_TPU_ABLATE), threaded into
    the kernels as a STATIC jit argument so one process can A/B kernel
    variants without invalidating every other compiled shape (Mosaic
    compiles through the tunnel are multi-minute and per-process).
    Letters: A skip C2 front-ends, B skip C2 write-backs, E skip C1
    rotation, F skip decode window maintenance, W old wide encode
    emission, C old unfused C2 blends.  A/B/E/F break bit-exactness —
    they exist to price subsystems on chip, never for production."""
    return os.environ.get("BZ3_TPU_ABLATE", "")


def _c2_window_update(e0, e1, cb, wai, wbi, new_wa, new_wb, active):
    """Apply the (wai, wbi) <- (new_wa, new_wb) packed-word updates to
    the extracted 2-chunk window vregs instead of blending the whole
    table: the SSE slots this bit writes always lie inside the window
    the front-end just gathered from (sse in [c2base, c2base+26])."""
    ra = wai - (cb << 7)
    rb = wbi - (cb << 7)
    col = jax.lax.broadcasted_iota(I32, e0.shape, 1)
    e0 = jnp.where(active & (ra == col), new_wa, e0)
    e0 = jnp.where(active & (rb == col), new_wb, e0)
    e1 = jnp.where(active & ((ra - 128) == col), new_wa, e1)
    e1 = jnp.where(active & ((rb - 128) == col), new_wb, e1)
    return e0, e1


def _c2_window_writeback(tbl_vals, e0, e1, cb):
    """Scan-write the updated window back over the hoisted table value:
    per chunk one 2-way select (4 ops) instead of the generic 2-entry
    blend (6 ops) — the only chunks that can differ are cb and cb+1."""
    w = tbl_vals.shape[1]
    cols = []
    for k in range(w // 128):
        chunk = tbl_vals[:, k * 128 : (k + 1) * 128]
        chunk = jnp.where(cb == k, e0, jnp.where(cb == (k - 1), e1, chunk))
        cols.append(chunk)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _make_decode_kernel(lanes, n_steps, in_chunks, spec_mul=True,
                        resume=False, first=True, last=True, ablate='',
                        out_rel=False):
    """out_rel=True (resumable only): hbm_out is a PER-LAUNCH buffer of
    this launch's [start, stop) steps (offsets relative to start) and is
    NOT carried across launches.  The oversize-block hybrid streams
    each chunk to the host instead of materializing the full [lanes,
    n_steps] i32 decode buffer (16 GiB at the 511 MiB format max)."""
    _ab = ablate
    n_flushes = n_steps // 128

    def kernel(*refs):
        if resume and out_rel:
            # chunked output: no prev-output alias; state-only aliases
            (plen_ref, olen_ref, start_ref, hbm_in,
             _rgs, _c1i, _smi, _c2i,
             hbm_out, regs_st, c1_st, small_st, c2_st,
             c1, rowa, rowb, win, ob, scal, c2w,
             c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7,
             c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7,
             regs_v,
             in_sems, out_sems, st_sem) = refs
        elif resume:
            # inputs aliased to outputs (same buffers): prev output,
            # regs, c1/small/c2 table spills
            (plen_ref, olen_ref, start_ref, hbm_in,
             _prev, _rgs, _c1i, _smi, _c2i,
             hbm_out, regs_st, c1_st, small_st, c2_st,
             c1, rowa, rowb, win, ob, scal, c2w,
             c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7,
             c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7,
             regs_v,
             in_sems, out_sems, st_sem) = refs
        else:
            (plen_ref, olen_ref, hbm_in, hbm_out,
             c1, rowa, rowb, win, ob, scal, c2w,
             c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7,
             c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7,
             in_sems, out_sems) = refs
        c0 = [c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7]
        c2 = [c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7]
        plen = plen_ref[...]
        olen = olen_ref[...]
        zeros = jnp.zeros((lanes, 128), I32)
        col128i = jax.lax.broadcasted_iota(I32, (lanes, 128), 1)
        if resume:
            start = start_ref[0, 0]
            stop = start_ref[0, 1]
        else:
            start = jnp.int32(0)
            stop = jnp.int32(n_steps)

        if first:
            _init_tables(c0, c1, c2, rowa, rowb)

            # ---- initial input window: chunks 0 and 1, all lanes ------
            for h in range(2):
                cp = pltpu.make_async_copy(
                    hbm_in.at[h, :, 0], win.at[h], in_sems.at[0]
                )
                cp.start()
                cp.wait()

            low = zeros
            high = jnp.full((lanes, 128), -1, I32)
            code = zeros
            ip = zeros
            base = zeros
        else:
            _load_tables_in(c1, rowa, rowb, c0, c2, c1_st, small_st,
                            c2_st, st_sem, lanes)
            cp = pltpu.make_async_copy(regs_st, regs_v, st_sem)
            cp.start()
            cp.wait()
            low = regs_v[0]
            high = regs_v[1]
            code = regs_v[2]
            ip = regs_v[3]
            c1v0 = regs_v[4]
            c2v0 = regs_v[5]
            runv0 = regs_v[6]
            # re-prime the per-lane staging window at the chunks the
            # cursors sit in (the maintenance loop's own DMA pattern)
            scal[0] = ip
            for l in range(lanes):
                ipl = scal[0, l, 0]
                for dl in range(2):
                    chunk = _srl(ipl, 10) + dl

                    @pl.when(chunk < in_chunks)
                    def _():
                        cp = pltpu.make_async_copy(
                            hbm_in.at[chunk & 1, l, _srl(chunk, 1)],
                            win.at[chunk & 1, l],
                            in_sems.at[l],
                        )
                        cp.start()
                        cp.wait()
            base = ip & ~jnp.int32(127)

        def _pack_words(base):
            """Packed 4-byte lookahead words from the 384-byte carry:
            p_c[off] = bytes [base + c*128 + off, +4) big-endian, with
            bytes at/past plen packed as 0xFF (the per-bit consumer
            subtracts the exhaustion correction — see pref note below).
            One [L,128] gather then yields all four lookahead bytes of
            a dynamic position at once, replacing four serial-summed
            byte gathers per bit with shifts of one word."""
            w0, w1, w2 = _win_gather(win, lanes, base)
            masked = []
            for part, w in enumerate((w0, w1, w2)):
                abs_pos = base + part * 128 + col128i
                masked.append(jnp.where(abs_pos < plen, w & 0xFF, jnp.int32(0xFF)))
            m0, m1, m2 = masked
            ext = jnp.int32(0xFF)  # beyond-window bytes are never read

            def shifted(a, b_next, j):
                # left-shift by j along the 128-lane axis == circular
                # roll by 128-j (pltpu.roll requires shift >= 0)
                r = pltpu.roll(a, 128 - j, 1)
                return jnp.where(
                    col128i >= 128 - j, pltpu.roll(b_next, 128 - j, 1), r
                )

            def pack(a, b_next):
                s1 = shifted(a, b_next, 1)
                s2 = shifted(a, b_next, 2)
                s3 = shifted(a, b_next, 3)
                return (a << 24) | (s1 << 16) | (s2 << 8) | s3

            p0 = pack(m0, m1)
            p1 = pack(m1, m2)
            p2 = pack(m2, jnp.full((lanes, 128), ext, I32))
            return p0, p1, p2

        def read_byte(p0, p1, p2, base, ipv):
            b = _srl(_gather3(p0, p1, p2, ipv - base), 24)
            return jnp.where(ipv < plen, b, jnp.int32(-1))

        pk0, pk1, pk2 = _pack_words(base)
        if first:
            for _ in range(4):
                code = (code << 8) + read_byte(pk0, pk1, pk2, base, ip)
                ip = ip + 1
            # staged-high water mark (absolute bytes DMA'd per lane)
            scal[3] = jnp.full((lanes, 128), 2048, I32)
            c1v = zeros
            c2v = zeros
            runv = zeros
        else:
            scal[3] = jnp.minimum(
                (_srl(ip, 10) + 2) << 10, jnp.int32(in_chunks) << 10
            )
            c1v = c1v0
            c2v = c2v0
            runv = runv0

        # Exhaustion corrections: the packed lookahead holds 0xFF for
        # bytes at/past plen, but the reference's refill semantics is
        # (code << 8) - 1 per exhausted byte; packing e trailing
        # exhausted bytes as 0xFF overshoots by sum(256^t, t=1..e).
        _CORR = (0, 0x100, 0x10100, 0x1010100, 0x01010100)

        def body(i, carry):
            (low, high, code, ip, base, pk0, pk1, pk2,
             c1v, c2v, runv, obuf) = carry
            active = i < olen
            runv = jnp.where(active, jnp.where(c1v == c2v, runv + 1, 0), runv)
            f = (runv > 2).astype(I32)

            # rowA/rowB and the per-bit tables are constant within the
            # byte (updates are deferred / bit-private), so all values
            # are hoisted and the table gathers for bit t+1 run
            # SPECULATIVELY on both ctx candidates while bit t's range
            # math resolves — the critical path holds only the range
            # coder, not the (330-cycle-latency) gathers.
            rowa_v = rowa[...]
            rowb_v = rowb[...]
            c0vs = [c0[t][...] for t in range(8)]
            c2vs = [c2[t][...] for t in range(8)]
            col128 = jax.lax.broadcasted_iota(I32, (lanes, 128), 1)

            def fe_c2(t, p0, sse, c2win):
                """C2/SSE lookup tail shared by fe_single/fe_pair.

                Packed layout: sse and sse+1 live in words sse>>1 and
                (sse+1)>>1 (equal when sse is even) — two word gathers
                yield both counters plus the words needed to build the
                update values without re-reading the table."""
                if 'A' in _ab:
                    return p0, p0, p0, p0
                wai = _srl(sse, 1)
                wbi = _srl(sse + 1, 1)
                if c2win is not None:
                    e0, e1, cb = c2win
                    wa = _win_pair_gather(e0, e1, cb, wai)
                    wb = _win_pair_gather(e0, e1, cb, wbi)
                else:
                    wa = _gather_wide(c2vs[t], wai)
                    wb = _gather_wide(c2vs[t], wbi)
                return _half(wa, sse), _half(wb, sse + 1), wa, wb

            def fe_pair(pctx, t, c2win=None):
                """Front-ends for BOTH candidate contexts (2p, 2p+1) at
                bit t >= 1.  The candidates share their C0/C1 packed
                words (adjacent slots), so one gather per table serves
                both.  Returns (shared, cand0, cand1); shared holds the
                packed words + word indices the update site needs."""
                p0wi = pctx - (1 << (t - 1))  # = rel(cand0) >> 1
                p0w = _gather_chunk(c0vs[t], p0wi)
                p1w = _gather_chunk(rowa_v, pctx)
                p2w = _gather_chunk(rowb_v, pctx)
                cands = []
                for par in (0, 1):
                    ctxv = pctx + pctx + par
                    rel = ctxv - (1 << t)
                    p0 = (p0w & 0xFFFF) if par == 0 else _srl(p0w, 16)
                    p1 = (p1w & 0xFFFF) if par == 0 else _srl(p1w, 16)
                    p2 = (p2w & 0xFFFF) if par == 0 else _srl(p2w, 16)
                    p = ((p0 + p1) * 7 + p2 + p2) >> 4
                    j = p >> 12
                    sse = (2 * rel + f) * 17 + j
                    x1, x2, wa, wb = fe_c2(t, p0, sse, c2win)
                    ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
                    cands.append((ssep * 3 + p, p0, p1, x1, x2, rel, sse, wa, wb))
                return (p0w, p0wi, p1w, pctx), cands[0], cands[1]

            def fe_single(ctxv, t):
                """Front-end for one known context (bit 0: ctx == 1)."""
                rel = ctxv - (1 << t)
                p0wi = _srl(rel, 1)
                p0w = _gather_chunk(c0vs[t], p0wi)
                p0 = _half(p0w, rel)
                p1wi = _srl(ctxv, 1)
                p1w = _gather_chunk(rowa_v, p1wi)
                p1 = _half(p1w, ctxv)
                p2w = _gather_chunk(rowb_v, p1wi)
                p2 = _half(p2w, ctxv)
                p = ((p0 + p1) * 7 + p2 + p2) >> 4
                j = p >> 12
                sse = (2 * rel + f) * 17 + j
                x1, x2, wa, wb = fe_c2(t, p0, sse, None)
                ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
                return (p0w, p0wi, p1w, p1wi), (
                    ssep * 3 + p, p0, p1, x1, x2, rel, sse, wa, wb,
                )

            def fe_sel(bit, f0, f1):
                return tuple(jnp.where(bit, b, a) for a, b in zip(f0, f1))

            ctx = jnp.ones((lanes, 128), I32)
            sh_cur, fe_cur = fe_single(ctx, 0)
            win_cur = None  # extracted C2 window of the CURRENT bit's table
            rowa_ups = []
            # per-bit stream lookahead: ONE packed-word gather at the
            # (bit-start-known) ip yields the next 4 bytes; the five
            # k-candidates adj[k] (k bytes consumed, exhaustion-
            # corrected) are all shifts/subtracts of it — off the
            # critical path, same 3-select-by-k chain as before.
            def refill_candidates(ip):
                # NB: pk* names are deliberately distinct from the
                # front-end counter names p0/p1 the bit loop rebinds.
                w = _gather3(pk0, pk1, pk2, ip - base)
                rem = plen - ip
                adj = [zeros]
                for kk in range(1, 5):
                    s = _srl(w, 8 * (4 - kk)) if kk < 4 else w
                    e = kk - jnp.clip(rem, 0, kk)
                    c = jnp.where(e == 1, jnp.int32(_CORR[1]), 0)
                    c = jnp.where(e == 2, jnp.int32(_CORR[2]), c)
                    if kk >= 3:
                        c = jnp.where(e == 3, jnp.int32(_CORR[3]), c)
                    if kk >= 4:
                        c = jnp.where(e == 4, jnp.int32(_CORR[4]), c)
                    adj.append(s - c)
                return adj
            # bit 0's range split computed directly; with spec_mul,
            # later bits get a SPECULATED multiply: the post-renorm
            # range is (d+1)<<8k - 1 for d = high-low before the shift,
            # so the five k-candidates run while k resolves in parallel
            # — the ~7-level multiply leaves the bit chain.  All five
            # come from ONE shared wide product (_spec_steps); the
            # earlier 5x-multiply form compiled superlinearly.
            if spec_mul:
                step = _mul_shift18_i32(high - low, fe_cur[0])
            adj = refill_candidates(ip)
            for t in range(8):
                if t < 7:
                    # Both candidates' C2 indices lie in one 52-entry
                    # window: sse = (4*rel_t + 2*bitc + f)*17 + j with
                    # bitc in {0,1}, j in [0,16] (+1 for x2), so
                    # idx - base in [0, 51] for base = (4*rel_t+f)*17
                    # — packed, words [base>>1, base>>1 + 26]: extract
                    # chunks wb>>7 and wb>>7 + 1 once, then all four
                    # word gathers hit the window.
                    if c2vs[t + 1].shape[1] > 256:
                        c2base = _srl((4 * (ctx - (1 << t)) + f) * 17, 1)
                        c2cb = _srl(c2base, 7)
                        if _C2SW:
                            # table t+1 is untouched until bit t+1's
                            # update, so the ref content here equals
                            # the byte-start value the vector path
                            # extracts from
                            e0, e1 = _c2_window_scalar(
                                c2[t + 1], c2w, scal, c2cb, lanes
                            )
                            c2win = (e0, e1, c2cb)
                        else:
                            c2win = (*_extract2(c2vs[t + 1], c2cb), c2cb)
                    else:
                        c2win = None
                    win_nxt = c2win
                    sh_nxt, cand0, cand1 = fe_pair(ctx, t + 1, c2win)
                s3p, p0, p1, x1, x2, rel, sse_rel, wa, wb = fe_cur
                if not spec_mul:
                    step = _mul_shift18_i32(high - low, s3p)
                mid = low + step
                bit = _ule(code, mid)
                high = jnp.where(bit & active, mid, high)
                low = jnp.where((~bit) & active, mid + 1, low)
                # collapsed renormalization: count, then one shift
                k = _renorm_count(low ^ high, active)
                if spec_mul and t < 7:
                    s3p_n = jnp.where(bit, cand1[0], cand0[0])
                    m0, m1, m2, m3, m4 = _spec_steps(high - low, s3p_n)
                    step = jnp.where(k == 1, m1, m0)
                    step = jnp.where(k == 2, m2, step)
                    step = jnp.where(k == 3, m3, step)
                    step = jnp.where(k == 4, m4, step)
                low = _shl8k(low, k)
                high = _shl8k(high, k) | _mask8k(k)
                sk = jnp.where(k == 0, adj[0], adj[1])
                sk = jnp.where(k == 2, adj[2], sk)
                sk = jnp.where(k == 3, adj[3], sk)
                sk = jnp.where(k == 4, adj[4], sk)
                code = _shl8k(code, k) + sk
                ip = ip + k
                # lookahead for the next bit (consumed next iteration)
                if t < 7:
                    adj = refill_candidates(ip)
                # bit-private table updates, off the critical path
                u0, u1, v1, v2 = _upd(bit, p0, p1, x1, x2)
                p0w, p0wi, p1w, p1wi = sh_cur
                c0[t][...] = jnp.where(
                    active & (col128 == p0wi), _set_half(p0w, rel, u0), c0vs[t]
                )
                if 'B' not in _ab:
                    new_wa, new_wb = _c2_pair_updates(sse_rel, v1, v2, wa, wb)
                    if win_cur is not None and 'C' not in _ab:
                        # fused path: update the 2-chunk window vregs
                        # the front-end already extracted, then one
                        # 2-way-select scan-write per chunk (the only
                        # chunks that can differ are cb and cb+1)
                        e0u, e1u = _c2_window_update(
                            win_cur[0], win_cur[1], win_cur[2],
                            _srl(sse_rel, 1), _srl(sse_rel + 1, 1),
                            new_wa, new_wb, active,
                        )
                        c2[t][...] = _c2_window_writeback(
                            c2vs[t], e0u, e1u, win_cur[2]
                        )
                    else:
                        c2[t][...] = _blend_wide(
                            c2vs[t],
                            [
                                (_srl(sse_rel, 1), new_wa, active),
                                (_srl(sse_rel + 1, 1), new_wb, active),
                            ],
                        )
                rowa_ups.append((p1wi, _set_half(p1w, ctx, u1), active))
                ctx = ctx + ctx + bit.astype(I32)
                if t < 7:
                    sh_cur = sh_nxt
                    fe_cur = fe_sel(bit, cand0, cand1)
                    win_cur = win_nxt

            rowa[...] = _blend_wide(rowa_v, rowa_ups)

            byte = ctx & 255
            obuf = jnp.where(
                jax.lax.broadcasted_iota(I32, (lanes, 128), 1) == (i & 127),
                jnp.where(active, byte, 0),
                obuf,
            )

            c1o = c1v
            c2v = jnp.where(active, c1v, c2v)
            c1v = jnp.where(active, byte, c1v)
            if 'E' not in _ab:
                _rotate_c1_rows(c1, rowa, rowb, scal, c1o, c1v, active, lanes)

            # ---- output flush every 128 steps ---------------------------
            @pl.when((i & 127) == 127)
            def _():
                slot = (i >> 7) & 1
                # (i>>7)*128 is provably 128-aligned (i-127 is not); in
                # chunked-output mode offsets are launch-relative
                # (start is a multiple of the 256-step chunk quantum,
                # so alignment carries).
                ob_base = start if out_rel else jnp.int32(0)
                off = pl.multiple_of((i >> 7) * 128 - ob_base, 128)

                # only wait for DMAs issued THIS launch (semaphores do
                # not carry across resumable launches; the drain below
                # settles everything at each launch end)
                @pl.when(i - start >= 256)
                def _():
                    off_prev = pl.multiple_of(
                        ((i >> 7) - 2) * 128 - ob_base, 128
                    )
                    pltpu.make_async_copy(
                        ob.at[slot], hbm_out.at[:, pl.ds(off_prev, 128)], out_sems.at[slot]
                    ).wait()

                ob[slot] = obuf
                pltpu.make_async_copy(
                    ob.at[slot], hbm_out.at[:, pl.ds(off, 128)], out_sems.at[slot]
                ).start()

            # ---- window maintenance every 4 steps (consumption is at
            # most 32 B/step, so the margins below hold; the gate is a
            # scalar loop-index compare — no vector->scalar sync).
            @pl.when(((i & 3) == 3) & ('F' not in _ab))
            def _():
                fh = scal[3]
                need_dma = (
                    active & (ip < plen) & (fh - ip < 640) & ((fh >> 10) < in_chunks)
                )

                @pl.when(jnp.any(need_dma))
                def _():
                    scal[0] = fh
                    scal[1] = need_dma.astype(I32)
                    for l in range(lanes):
                        fl = scal[0, l, 0]
                        nd = scal[1, l, 0]

                        @pl.when(nd == 1)
                        def _():
                            chunk = _srl(fl, 10)
                            pltpu.make_async_copy(
                                hbm_in.at[chunk & 1, l, _srl(chunk, 1)],
                                win.at[chunk & 1, l],
                                in_sems.at[l],
                            ).start()
                    for l in range(lanes):
                        fl = scal[0, l, 0]
                        nd = scal[1, l, 0]

                        @pl.when(nd == 1)
                        def _():
                            chunk = _srl(fl, 10)
                            pltpu.make_async_copy(
                                hbm_in.at[chunk & 1, l, _srl(chunk, 1)],
                                win.at[chunk & 1, l],
                                in_sems.at[l],
                            ).wait()
                    scal[3] = fh + 1024 * need_dma.astype(I32)

            def _refresh(base, pk0, pk1, pk2):
                b2 = base + 128 * ((ip - base) >= 128).astype(I32)
                n0, n1, n2 = _pack_words(b2)
                return b2, n0, n1, n2

            base, pk0, pk1, pk2 = jax.lax.cond(
                (i & 3) == 3,
                _refresh,
                lambda base, pk0, pk1, pk2: (base, pk0, pk1, pk2),
                base, pk0, pk1, pk2,
            )

            return (low, high, code, ip, base, pk0, pk1, pk2,
                    c1v, c2v, runv, obuf)

        carry = (low, high, code, ip, base, pk0, pk1, pk2,
                 c1v, c2v, runv, zeros)
        carry = jax.lax.fori_loop(start, stop, body, carry)

        if resume:
            # drain THIS launch's last two output flushes (chunks are
            # multiples of 256 steps, so both exist), then spill.
            fl = _srl(stop, 7)  # flush count through `stop`
            ob_base = start if out_rel else jnp.int32(0)
            for back in (1, 2):
                pltpu.make_async_copy(
                    ob.at[(fl - back) & 1],
                    hbm_out.at[
                        :,
                        pl.ds(
                            pl.multiple_of((fl - back) * 128 - ob_base, 128),
                            128,
                        ),
                    ],
                    out_sems.at[(fl - back) & 1],
                ).wait()
            low, high, code, ip, _b, _p0, _p1, _p2, c1v, c2v, runv, _ob = carry
            regs_v[0] = low
            regs_v[1] = high
            regs_v[2] = code
            regs_v[3] = ip
            regs_v[4] = c1v
            regs_v[5] = c2v
            regs_v[6] = runv
            regs_v[7] = zeros
            cp = pltpu.make_async_copy(regs_v, regs_st, st_sem)
            cp.start()
            cp.wait()
            if not last:
                _spill_tables_out(c1, rowa, rowb, c0, c2, c1_st, small_st,
                                  c2_st, st_sem, lanes)
            return

        # drain outstanding output DMAs
        if n_flushes >= 1:
            pltpu.make_async_copy(
                ob.at[(n_flushes - 1) & 1],
                hbm_out.at[:, pl.ds((n_flushes - 1) * 128, 128)],
                out_sems.at[(n_flushes - 1) & 1],
            ).wait()
        if n_flushes >= 2:
            pltpu.make_async_copy(
                ob.at[(n_flushes - 2) & 1],
                hbm_out.at[:, pl.ds((n_flushes - 2) * 128, 128)],
                out_sems.at[(n_flushes - 2) & 1],
            ).wait()

    return kernel


def _c2_shapes(lanes):
    # packed: 34 * 2**t slots -> 17 * 2**t words
    return [
        pltpu.VMEM((lanes, -(-(17 << t) // 128) * 128), I32) for t in range(8)
    ]


def _c0_shapes(lanes):
    return [pltpu.VMEM((lanes, 128), I32) for _ in range(8)]


@partial(jax.jit, static_argnames=("lanes", "n_steps", "in_chunks", "interpret", "spec", "ablate"))
def _decode_call(payload, plens, olens, lanes, n_steps, in_chunks, interpret, spec=False, ablate=''):
    """payload: [2, lanes, in_chunks//2, 8, 128] i32 (slot-split view)."""
    kern = _make_decode_kernel(lanes, n_steps, in_chunks, spec_mul=spec, ablate=ablate)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((lanes, n_steps), I32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((lanes, 256, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((2, lanes, 8, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            pltpu.VMEM((4, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            *_c0_shapes(lanes),
            *_c2_shapes(lanes),
            pltpu.SemaphoreType.DMA((lanes,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(plens[:, None].astype(I32), (lanes, 128)),
        jnp.broadcast_to(olens[:, None].astype(I32), (lanes, 128)),
        payload,
    )
    return out


@partial(jax.jit, static_argnames=(
    "lanes", "n_steps", "in_chunks", "interpret", "spec", "first", "last",
    "ablate"),
    donate_argnums=(4, 5, 6, 7, 8))
def _decode_call_resume(payload, plens, olens, startstop, out_prev,
                        regs, c1s, smalls, c2s,
                        lanes, n_steps, in_chunks, interpret, spec,
                        first, last, ablate=''):
    # The carried state (out_prev/regs/c1s/smalls/c2s) is DONATED at
    # the jit boundary: the pallas input_output_aliases below only
    # alias within the program — without jit-level donation XLA must
    # COPY every carried buffer per launch (at 128 MiB blocks that is
    # a 4 GiB output copy per launch; at the 511 MiB hybrid it was an
    # assured OOM).
    kern = _make_decode_kernel(lanes, n_steps, in_chunks, spec_mul=spec,
                               resume=True, first=first, last=last,
                               ablate=ablate)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((lanes, n_steps), I32),
            jax.ShapeDtypeStruct((8, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, 256, 128), I32),
            jax.ShapeDtypeStruct((10, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, _C2_SUM), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # plen
            pl.BlockSpec(memory_space=pltpu.VMEM),   # olen (lengths)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # startstop (1,2)
            pl.BlockSpec(memory_space=pl.ANY),       # hbm_in
            pl.BlockSpec(memory_space=pl.ANY),       # prev out (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # regs (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c1 (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # small (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c2 (alias)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3, 8: 4},
        scratch_shapes=[
            pltpu.VMEM((lanes, 256, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((2, lanes, 8, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            pltpu.VMEM((4, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            *_c0_shapes(lanes),
            *_c2_shapes(lanes),
            pltpu.VMEM((8, lanes, 128), I32),
            pltpu.SemaphoreType.DMA((lanes,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(plens[:, None].astype(I32), (lanes, 128)),
        jnp.broadcast_to(olens[:, None].astype(I32), (lanes, 128)),
        startstop,
        payload,
        out_prev, regs, c1s, smalls, c2s,
    )
    return outs


@partial(jax.jit, static_argnames=(
    "lanes", "chunk_steps", "n_steps", "in_chunks", "interpret", "spec",
    "first", "last", "ablate"),
    donate_argnums=(4, 5, 6, 7))
def _decode_call_resume_chunk(payload, plens, olens, startstop,
                              regs, c1s, smalls, c2s,
                              lanes, chunk_steps, n_steps, in_chunks,
                              interpret, spec, first, last, ablate=''):
    """One launch of the CHUNKED-OUTPUT resumable decode: returns this
    launch's [lanes, chunk_steps] output plus the carried state (no
    whole-block output buffer — see _make_decode_kernel out_rel)."""
    kern = _make_decode_kernel(lanes, n_steps, in_chunks, spec_mul=spec,
                               resume=True, first=first, last=last,
                               ablate=ablate, out_rel=True)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((lanes, chunk_steps), I32),
            jax.ShapeDtypeStruct((8, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, 256, 128), I32),
            jax.ShapeDtypeStruct((10, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, _C2_SUM), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # plen
            pl.BlockSpec(memory_space=pltpu.VMEM),   # olen (lengths)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # startstop (1,2)
            pl.BlockSpec(memory_space=pl.ANY),       # hbm_in
            pl.BlockSpec(memory_space=pl.ANY),       # regs (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c1 (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # small (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c2 (alias)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={4: 1, 5: 2, 6: 3, 7: 4},
        scratch_shapes=[
            pltpu.VMEM((lanes, 256, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((2, lanes, 8, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            pltpu.VMEM((4, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            *_c0_shapes(lanes),
            *_c2_shapes(lanes),
            pltpu.VMEM((8, lanes, 128), I32),
            pltpu.SemaphoreType.DMA((lanes,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(plens[:, None].astype(I32), (lanes, 128)),
        jnp.broadcast_to(olens[:, None].astype(I32), (lanes, 128)),
        startstop,
        payload,
        regs, c1s, smalls, c2s,
    )
    return outs


def cm_decode_pallas_stream(
    data: jax.Array,
    in_lens: jax.Array,
    out_lens: jax.Array,
    out_width: int,
    lanes: int | None = None,
    interpret: bool | None = None,
    spec: bool | None = None,
):
    """Chunked-output decode for OVERSIZE blocks: yields
    (step_start, [rows, chunk] uint8 device array) pieces in order
    instead of one [K, out_width] buffer, so HBM never holds the whole
    i32 decode (16 GiB at the 511 MiB format max).  The caller pulls
    each piece (async D2H) and assembles on the host — the oversize
    hybrid then runs the inverse BWT there (pipeline.py)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lanes = _pick_lanes(data.shape[0], lanes)
    if spec is None:
        spec = os.environ.get("BZ3_TPU_SPEC_MUL", "1") == "1"
    k_dim, m = data.shape
    if k_dim > lanes:
        raise ValueError("stream decode serves one lane group")
    # 256-step quantum: the resumable drain waits on the launch's last
    # TWO flushes, so every launch (incl. the final partial one) must
    # cover >= 256 steps.
    n_steps = max(256, -(-out_width // 256) * 256)
    m_in = max(2048, -(-(m + 64) // 2048) * 2048) + 2048
    in_chunks = m_in // 1024
    pay = jnp.zeros((lanes, m_in), I32)
    pay = pay.at[:k_dim, :m].set(data.astype(I32))
    pay = pay.reshape(lanes, in_chunks // 2, 2, 8, 128).transpose(2, 0, 1, 3, 4)
    pl_ = jnp.zeros((lanes,), I32).at[:k_dim].set(in_lens.astype(I32))
    ol = jnp.zeros((lanes,), I32).at[:k_dim].set(out_lens.astype(I32))
    regs = jnp.zeros((8, lanes, 128), I32)
    c1s = jnp.zeros((lanes, 256, 128), I32)
    smalls = jnp.zeros((10, lanes, 128), I32)
    c2s = jnp.zeros((lanes, _C2_SUM), I32)
    cs = _chunk_steps(lanes)
    starts = list(range(0, n_steps, cs))
    for j, s in enumerate(starts):
        e = min(s + cs, n_steps)
        ss = jnp.asarray(np.array([[s, e]], np.int32))
        out_chunk, regs, c1s, smalls, c2s = _decode_call_resume_chunk(
            pay, pl_, ol, ss, regs, c1s, smalls, c2s,
            lanes=lanes, chunk_steps=cs, n_steps=n_steps,
            in_chunks=in_chunks, interpret=interpret, spec=spec,
            first=(j == 0), last=(j == len(starts) - 1), ablate=_ablate(),
        )
        yield s, out_chunk[:k_dim, : e - s].astype(jnp.uint8)


def _decode_resumable(pay, pl_, ol, lanes, n_steps, in_chunks, interpret, spec,
                      ablate=''):
    out_buf = jnp.zeros((lanes, n_steps), I32)
    regs = jnp.zeros((8, lanes, 128), I32)
    c1s = jnp.zeros((lanes, 256, 128), I32)
    smalls = jnp.zeros((10, lanes, 128), I32)
    c2s = jnp.zeros((lanes, _C2_SUM), I32)
    cs = _chunk_steps(lanes)
    starts = list(range(0, n_steps, cs))
    for j, s in enumerate(starts):
        e = min(s + cs, n_steps)
        ss = jnp.asarray(np.array([[s, e]], np.int32))
        out_buf, regs, c1s, smalls, c2s = _decode_call_resume(
            pay, pl_, ol, ss, out_buf, regs, c1s, smalls, c2s,
            lanes=lanes, n_steps=n_steps, in_chunks=in_chunks,
            interpret=interpret, spec=spec,
            first=(j == 0), last=(j == len(starts) - 1), ablate=ablate,
        )
    return out_buf


def _pick_lanes(k_dim: int, lanes: int | None, cap_default: int = 32) -> int:
    """Default lane count: smallest power of two >= k_dim, clamped to
    [8, BZ3_TPU_CM_LANES (default 32)].  Round-4 sweep on chip
    (128 KiB/lane): encode 10.5/12.1/12.2/12.2 and decode
    7.0/8.6/8.4/8.6 MB/s at L=16/32/48/64 — BOTH directions saturate
    at 32 (every [L,128] vreg op is L/8 sublane tiles, so per-step
    wall grows linearly past L=8 and wider lanes stop paying).  Small
    batches shouldn't pay the wider kernel's per-step cost either
    (lanes only grow to cover the actual batch)."""
    if lanes is not None:
        return lanes
    cap = max(8, int(os.environ.get("BZ3_TPU_CM_LANES", str(cap_default))))
    l = 8
    while l < min(cap, k_dim):
        l *= 2
    return min(l, cap)  # honor a non-power-of-two cap exactly


def cm_decode_pallas_batch(
    data: jax.Array,
    in_lens: jax.Array,
    out_lens: jax.Array,
    out_width: int,
    lanes: int | None = None,
    interpret: bool | None = None,
    spec: bool | None = None,
):
    """Drop-in for cm_decode_batch via the Pallas lane kernel.

    data: [K, M] uint8; returns [K, out_width] uint8.  Rows are split
    into groups of ``lanes``; each group is one kernel launch.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lanes = _pick_lanes(data.shape[0], lanes)
    if spec is None:
        spec = os.environ.get("BZ3_TPU_SPEC_MUL", "1") == "1"
    k_dim, m = data.shape
    n_steps = max(128, -(-out_width // 128) * 128)
    m_in = max(2048, -(-(m + 64) // 2048) * 2048) + 2048
    in_chunks = m_in // 1024  # even by construction (2 KiB rounding)
    outs = []
    for g in range(0, k_dim, lanes):
        rows = min(lanes, k_dim - g)
        pay = jnp.zeros((lanes, m_in), I32)
        pay = pay.at[:rows, :m].set(data[g : g + rows].astype(I32))
        # slot-split 5-D view: [2 slots, L, chunk-pairs, 8, 128]
        pay = pay.reshape(lanes, in_chunks // 2, 2, 8, 128).transpose(2, 0, 1, 3, 4)
        pl_ = jnp.zeros((lanes,), I32).at[:rows].set(in_lens[g : g + rows].astype(I32))
        ol = jnp.zeros((lanes,), I32).at[:rows].set(out_lens[g : g + rows].astype(I32))
        if n_steps > _chunk_steps(lanes) or os.environ.get("BZ3_TPU_CM_RESUME", "0") == "1":
            out = _decode_resumable(
                pay, pl_, ol, lanes, n_steps, in_chunks, interpret, spec,
                ablate=_ablate(),
            )
        else:
            out = _decode_call(pay, pl_, ol, lanes, n_steps, in_chunks,
                               interpret, spec, ablate=_ablate())
        outs.append(out[:rows, :out_width].astype(jnp.uint8))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


# ---------------------------------------------------------------------------
# Encode kernel
# ---------------------------------------------------------------------------


# State layout for RESUMABLE launches (blocks whose CM run would trip
# the TPU runtime's ~2-minute kernel-duration watchdog split into
# multiple launches, PERF_NOTES R3.8).  Between launches the adaptive
# tables spill to HBM in/out refs and the per-lane registers ride one
# [8, L, 128] array; the input/output DMA pipelines re-prime from the
# absolute cursors.  Chunk boundaries are multiples of 256 steps so
# the staging double-buffers' slot parity and the output flush
# alignment carry over unchanged.
_ENC_REGS = ("low", "high", "optr", "moved", "c1v", "c2v", "runv")
_DEC_REGS = ("low", "high", "code", "ip", "c1v", "c2v", "runv")
# per-launch step chunk (multiple of 256); 16 Mi steps ~= 60 s of
# kernel time AT 8 LANES, safely under the watchdog
_CM_CHUNK_STEPS = (int(os.environ.get("BZ3_TPU_CM_CHUNK_MI", "16")) << 20)


def _chunk_steps(lanes: int) -> int:
    """Per-launch step budget, scaled so KERNEL DURATION stays under
    the ~62 s watchdog floor (R3.8): per-step cost is ~linear in L past
    8 lanes but so is throughput up to L=32 (R4 sweep: dec 7.0/8.6 at
    L=16/32, 3.7 us/step at 32), so a launch's WALL is ~(L/16) x
    2.3 us x steps.  16 Mi steps at L<=16 is ~38 s of decode; L=32
    takes 8 Mi (~31 s).  Fewer, longer launches also mean fewer
    distinct (first, last) kernel variants to Mosaic-compile — at 2
    launches only two variants exist per direction.  Multiples of 256
    keep the staging double-buffers' slot parity and flush alignment
    across launch cuts.  Launch-boundary cost is ~10 MB of state
    spill/reload per 32-lane group — microseconds against a
    multi-second launch."""
    return max(256, (_CM_CHUNK_STEPS * 16 // max(16, lanes)) & ~255)
_C2_SUM = sum(-(-(17 << t) // 128) * 128 for t in range(8))


def _c2_offsets(lanes):
    """Static column offsets of each packed C2_t inside one [L, sumW]
    spill buffer (widths are 128-multiples, so slices DMA cleanly)."""
    offs = []
    off = 0
    for t in range(8):
        w = -(-(17 << t) // 128) * 128
        offs.append((off, w))
        off += w
    return offs, off


def _spill_tables_out(c1, rowa, rowb, c0, c2, c1_out, small_out, c2_out, sem, lanes):
    cp = pltpu.make_async_copy(c1, c1_out, sem)
    cp.start()
    cp.wait()
    for j, ref in enumerate(c0 + [rowa, rowb]):
        cp = pltpu.make_async_copy(ref, small_out.at[j], sem)
        cp.start()
        cp.wait()
    offs, _ = _c2_offsets(lanes)
    for t in range(8):
        off, w = offs[t]
        cp = pltpu.make_async_copy(c2[t], c2_out.at[:, pl.ds(off, w)], sem)
        cp.start()
        cp.wait()


def _load_tables_in(c1, rowa, rowb, c0, c2, c1_in, small_in, c2_in, sem, lanes):
    cp = pltpu.make_async_copy(c1_in, c1, sem)
    cp.start()
    cp.wait()
    for j, ref in enumerate(c0 + [rowa, rowb]):
        cp = pltpu.make_async_copy(small_in.at[j], ref, sem)
        cp.start()
        cp.wait()
    offs, _ = _c2_offsets(lanes)
    for t in range(8):
        off, w = offs[t]
        cp = pltpu.make_async_copy(c2_in.at[:, pl.ds(off, w)], c2[t], sem)
        cp.start()
        cp.wait()


def _make_encode_kernel(lanes, n_steps, out_chunks, spec_mul=True,
                        resume=False, first=True, last=True, ablate=''):
    """resume=False is the original single-launch kernel; resume=True
    adds spill/reload refs and runs steps [start, start+chunk) of the
    absolute loop (start from an SMEM scalar, a multiple of 256)."""
    _ab = ablate

    def kernel(*refs):
        if resume:
            # state arrays are INPUT-OUTPUT ALIASED (same buffers in
            # and out), so each launch continues where the previous
            # stopped — including hbm_out, which accumulates flushed
            # slots across launches.
            (ilen_ref, start_ref, hbm_in, _o, _c1s, _sms, _c2s, _rgs,
             _wvs, _wsts,
             hbm_out, olen_ref,
             c1_st, small_st, c2_st, regs_st, wv_st, wst_st,
             c1, rowa, rowb, ib, wst, scal, c2w,
             c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7,
             c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7,
             regs_v, wv_v,
             in_sems, out_sems, st_sem) = refs
        else:
            (ilen_ref, hbm_in, hbm_out, olen_ref,
             c1, rowa, rowb, ib, wst, scal, c2w,
             c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7,
             c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7,
             in_sems, out_sems) = refs
        c0 = [c0_0, c0_1, c0_2, c0_3, c0_4, c0_5, c0_6, c0_7]
        c2 = [c2_0, c2_1, c2_2, c2_3, c2_4, c2_5, c2_6, c2_7]
        ilen = ilen_ref[...]

        zeros = jnp.zeros((lanes, 128), I32)
        if resume:
            start = start_ref[0, 0]
            stop = start_ref[0, 1]
        else:
            start = jnp.int32(0)
            stop = jnp.int32(n_steps)

        if first:
            _init_tables(c0, c1, c2, rowa, rowb)
            low = zeros
            high = jnp.full((lanes, 128), -1, I32)
            optr = zeros
            moved = zeros
            c1v = zeros
            c2v = zeros
            runv = zeros
        else:
            _load_tables_in(c1, rowa, rowb, c0, c2, c1_st, small_st,
                            c2_st, st_sem, lanes)
            cp = pltpu.make_async_copy(wst_st, wst, st_sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(regs_st, regs_v, st_sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(wv_st, wv_v, st_sem)
            cp.start()
            cp.wait()
            low = regs_v[0]
            high = regs_v[1]
            optr = regs_v[2]
            moved = regs_v[3]
            c1v = regs_v[4]
            c2v = regs_v[5]
            runv = regs_v[6]

        # prime the input pipeline at the launch's first chunk; the
        # body prefetches k+1 itself from the second chunk on (at the
        # very first chunk of the FIRST launch the body's i >= 128
        # guard suppresses that, so prime chunk 1 here too).
        if first:
            pltpu.make_async_copy(
                hbm_in.at[:, pl.ds(0, 128)], ib.at[0], in_sems.at[0]
            ).start()
            if n_steps > 128:
                pltpu.make_async_copy(
                    hbm_in.at[:, pl.ds(128, 128)], ib.at[1], in_sems.at[1]
                ).start()
        else:
            # windowed input: this launch's first chunk is window
            # offset 0; the staging slot keeps ABSOLUTE chunk parity.
            k0 = _srl(start, 7)
            pltpu.make_async_copy(
                hbm_in.at[:, pl.ds(0, 128)],
                ib.at[k0 & 1],
                in_sems.at[k0 & 1],
            ).start()

        wcol_iota = jax.lax.broadcasted_iota(I32, (lanes, 256), 1)

        def emit(wv, optr, low, do):
            """Blend (low >> 24) into the 256-circular carry at optr."""
            b = _srl(low, 24)
            loc = optr & 255
            m = jnp.broadcast_to(do[:, :1], (lanes, 256)) & (
                wcol_iota == jnp.broadcast_to(loc[:, :1], (lanes, 256))
            )
            wv = jnp.where(m, jnp.broadcast_to(b[:, :1], (lanes, 256)), wv)
            return wv, optr + do.astype(I32)

        def wv_half(wv, l, sel):
            lo = wv[l, 0:128]
            hi = wv[l, 128:256]
            return jnp.where(sel == 0, lo, hi)

        def body(i, carry):
            low, high, optr, moved, c1v, c2v, runv, wv = carry
            active = i < ilen

            # chunk k's DMA (primed at k-1 or at kernel start) must land
            # before its first byte is read; then prefetch chunk k+1.
            # In the RESUMABLE regime hbm_in is a PER-LAUNCH window of
            # [start, stop) (the wrapper slices it from a u8 source so
            # the i32 staging is one launch-chunk, not the whole
            # block): byte offsets are window-relative; slot parity
            # stays on the ABSOLUTE chunk index (start is a multiple
            # of 256 = 2 chunks, so parities agree across launches).
            @pl.when((i & 127) == 0)
            def _():
                k = i >> 7
                ioff = (i - start) if resume else i
                pltpu.make_async_copy(
                    hbm_in.at[:, pl.ds(pl.multiple_of(ioff, 128), 128)],
                    ib.at[k & 1],
                    in_sems.at[k & 1],
                ).wait()
                nxt_ok = (
                    (ioff + 128 < stop - start)
                    if resume
                    else ((k + 1) * 128 < n_steps)
                )

                @pl.when((i >= 128) & nxt_ok)
                def _():
                    pltpu.make_async_copy(
                        hbm_in.at[:, pl.ds(pl.multiple_of(ioff + 128, 128), 128)],
                        ib.at[(k + 1) & 1],
                        in_sems.at[(k + 1) & 1],
                    ).start()

            slot = (i >> 7) & 1
            cbyte = _gather_chunk(
                jnp.where(slot == 0, ib[0], ib[1]),
                jnp.zeros((lanes, 128), I32) + (i & 127),
            )

            runv = jnp.where(active, jnp.where(c1v == c2v, runv + 1, 0), runv)
            f = (runv > 2).astype(I32)

            c = cbyte & 255
            rowa_v = rowa[...]
            rowb_v = rowb[...]
            c0vs = [c0[t][...] for t in range(8)]
            c2vs = [c2[t][...] for t in range(8)]
            col128 = jax.lax.broadcasted_iota(I32, (lanes, 128), 1)

            # Every bit of the byte is known up front, so ALL eight
            # front-ends (gathers + prediction ALU) run in parallel at
            # byte start; the serial chain is only the range coder.
            bits = []
            ctxs = []
            ctx = jnp.ones((lanes, 128), I32)
            for t in range(8):
                bit = (c & 128) != 0
                bits.append(bit)
                ctxs.append(ctx)
                ctx = ctx + ctx + bit.astype(I32)
                c = (c << 1) & 0xFF
            fes = []
            wins = []  # per-bit extracted C2 window (or None)
            for t in range(8):
                ctxv = ctxs[t]
                rel = ctxv - (1 << t)
                p0wi = _srl(rel, 1)
                p0w = _gather_chunk(c0vs[t], p0wi)
                p0 = _half(p0w, rel)
                p1wi = _srl(ctxv, 1)
                p1w = _gather_chunk(rowa_v, p1wi)
                p1 = _half(p1w, ctxv)
                p2w = _gather_chunk(rowb_v, p1wi)
                p2 = _half(p2w, ctxv)
                p = ((p0 + p1) * 7 + p2 + p2) >> 4
                j = p >> 12
                sse_rel = (2 * rel + f) * 17 + j
                wai = _srl(sse_rel, 1)
                wbi = _srl(sse_rel + 1, 1)
                if 'A' in _ab:
                    wins.append(None)
                    fes.append((p, p0, p0, p0, p0, rel, sse_rel, p0w, p0w,
                                p0w, p0wi, p1w, p1wi))
                    continue
                if c2vs[t].shape[1] > 256:
                    # Single known context: idx - base = j in [0, 17]
                    # for base = (2*rel+f)*17 — packed words span <= 10,
                    # a 2-chunk window.
                    c2cb = _srl(_srl((2 * rel + f) * 17, 1), 7)
                    if _C2SW:
                        # front-ends all read at byte start, before any
                        # of this byte's table updates — ref == value
                        we0, we1 = _c2_window_scalar(
                            c2[t], c2w, scal, c2cb, lanes
                        )
                    else:
                        we0, we1 = _extract2(c2vs[t], c2cb)
                    wa = _win_pair_gather(we0, we1, c2cb, wai)
                    wb = _win_pair_gather(we0, we1, c2cb, wbi)
                    wins.append((we0, we1, c2cb))
                else:
                    wa = _gather_wide(c2vs[t], wai)
                    wb = _gather_wide(c2vs[t], wbi)
                    wins.append(None)
                x1 = _half(wa, sse_rel)
                x2 = _half(wb, sse_rel + 1)
                ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
                fes.append(
                    (ssep * 3 + p, p0, p1, x1, x2, rel, sse_rel, wa, wb,
                     p0w, p0wi, p1w, p1wi)
                )

            rowa_ups = []
            # same speculated-multiply trick as decode; on the encode
            # side the next bit's s3p is known statically, so the five
            # candidate products need no post-selection by bit.
            if spec_mul:
                step = _mul_shift18_i32(high - low, fes[0][0])
            # Narrow emission staging (default; 'W' restores the old
            # per-bit [L, 256] blend): each bit writes its <= 4 renorm
            # bytes into a [L, 128] staging at the within-byte offset
            # kc, and ONE spread pass per byte moves them into the
            # circular carry.  A bit always writes 4 slots at [kc,
            # kc+4) unconditionally — safe because the last bit with
            # kc_t <= s is exactly the bit whose emission covers slot
            # s (kc is the cumsum of k), so later writers overwrite
            # any over-write, and slots >= final kc are masked off in
            # the spread.
            wide_emit = 'W' in _ab
            optr0 = optr
            if not wide_emit:
                stg = jnp.zeros((lanes, 128), I32)
                kc = jnp.zeros((lanes, 128), I32)
            for t in range(8):
                (s3p, p0, p1, x1, x2, rel, sse_rel, wa, wb,
                 p0w, p0wi, p1w, p1wi) = fes[t]
                bit = bits[t]
                if not spec_mul:
                    step = _mul_shift18_i32(high - low, s3p)
                high = jnp.where(bit & active, low + step, high)
                low = jnp.where((~bit) & active, low + step + 1, low)
                # collapsed renorm: count, emit k top bytes, one shift
                k = _renorm_count(low ^ high, active)
                if spec_mul and t < 7:
                    m0, m1, m2, m3, m4 = _spec_steps(high - low, fes[t + 1][0])
                    step = jnp.where(k == 1, m1, m0)
                    step = jnp.where(k == 2, m2, step)
                    step = jnp.where(k == 3, m3, step)
                    step = jnp.where(k == 4, m4, step)
                if wide_emit:
                    # one range-masked blend emits all k <= 4 renorm
                    # bytes straight into the [L, 256] circular carry
                    col_rel = (
                        wcol_iota
                        - jnp.broadcast_to((optr & 255)[:, :1], (lanes, 256))
                    ) & 255
                    sh = 24 - (jnp.minimum(col_rel, 3) << 3)
                    vals = _srl(
                        jnp.broadcast_to(low[:, :1], (lanes, 256)), sh
                    ) & 0xFF
                    wv = jnp.where(
                        col_rel < jnp.broadcast_to(k[:, :1], (lanes, 256)),
                        vals, wv,
                    )
                else:
                    col_rel = col128 - kc
                    sh = 24 - (jnp.clip(col_rel, 0, 3) << 3)
                    stg = jnp.where(
                        (col_rel >= 0) & (col_rel < 4),
                        _srl(low, sh) & 0xFF,
                        stg,
                    )
                    kc = kc + k
                optr = optr + k
                low = _shl8k(low, k)
                high = _shl8k(high, k) | _mask8k(k)
                u0, u1, v1, v2 = _upd(bit, p0, p1, x1, x2)
                c0[t][...] = jnp.where(
                    active & (col128 == p0wi), _set_half(p0w, rel, u0), c0vs[t]
                )
                if 'B' not in _ab:
                    new_wa, new_wb = _c2_pair_updates(sse_rel, v1, v2, wa, wb)
                    if wins[t] is not None and 'C' not in _ab:
                        e0u, e1u = _c2_window_update(
                            wins[t][0], wins[t][1], wins[t][2],
                            _srl(sse_rel, 1), _srl(sse_rel + 1, 1),
                            new_wa, new_wb, active,
                        )
                        c2[t][...] = _c2_window_writeback(
                            c2vs[t], e0u, e1u, wins[t][2]
                        )
                    else:
                        c2[t][...] = _blend_wide(
                            c2vs[t],
                            [
                                (_srl(sse_rel, 1), new_wa, active),
                                (_srl(sse_rel + 1, 1), new_wb, active),
                            ],
                        )
                rowa_ups.append((p1wi, _set_half(p1w, ctxs[t], u1), active))

            rowa[...] = _blend_wide(rowa_v, rowa_ups)

            if not wide_emit:
                # spread this byte's staged emission into the circular
                # carry: carry slot with rel = (slot - optr0) mod 256
                # takes stg[rel] when rel < (optr - optr0)
                rel256 = (
                    wcol_iota
                    - jnp.broadcast_to((optr0 & 255)[:, :1], (lanes, 256))
                ) & 255
                idx = rel256 & 31  # <= 32 bytes per byte-step
                g = jnp.concatenate(
                    [
                        _gather_chunk(stg, idx[:, :128]),
                        _gather_chunk(stg, idx[:, 128:]),
                    ],
                    axis=1,
                )
                kc_end = jnp.broadcast_to((optr - optr0)[:, :1], (lanes, 256))
                wv = jnp.where(rel256 < kc_end, g, wv)

            c1o = c1v
            c2v = jnp.where(active, c1v, c2v)
            c1v = jnp.where(active, ctx & 255, c1v)
            if 'E' not in _ab:
                _rotate_c1_rows(c1, rowa, rowb, scal, c1o, c1v, active, lanes)

            # ---- move filled carry halves into staging (checked every 4
            # steps; emission <= 32 B/step keeps the 256-byte carry safe)
            need = ((optr - moved) >= 128) & ((i & 3) == 3)

            @pl.when(jnp.any(need))
            def _():
                # The staging STORE runs unconditionally per lane (the
                # branch regions cost ~60-70 ns each, the guarded row
                # store is free — same finding as the C1 rotation,
                # PERF_NOTES R3.11).  A non-crossing lane stores its
                # IN-PROGRESS half into that half's future slot, which
                # is re-stored complete at the actual crossing before
                # the sub==7 DMA of its chunk can fire — and the DMA is
                # synchronous (start+wait), so no in-flight reader ever
                # observes the provisional bytes.
                scal[0] = moved | (need.astype(I32) << 30)
                for l in range(lanes):
                    w = scal[0, l, 0]
                    mv = w & 0x3FFFFFFF
                    # Output-capacity clamp: when the caller sizes the
                    # output below the worst case (the oversize-block
                    # hybrid caps it to keep the [8-lane-padded] i32
                    # staging inside HBM), a row whose payload overruns
                    # must not DMA past hbm_out — its optr keeps
                    # counting, the wrapper's plens > width check
                    # flags the row, and the pipeline re-encodes it
                    # through another engine.
                    mv = jnp.minimum(mv, jnp.int32(out_chunks * 1024 - 1024))
                    chunk = _srl(mv, 10)
                    sub = _srl(mv, 7) & 7
                    sel = _srl(mv, 7) & 1  # which carry half is full
                    wst[chunk & 1, l, sub, :] = wv_half(wv, l, sel)

                    # staged the 8th sub-tile: DMA the 1 KiB slot out
                    @pl.when((w >= (1 << 30)) & (sub == 7))
                    def _():
                        cp = pltpu.make_async_copy(
                            wst.at[chunk & 1, l],
                            hbm_out.at[chunk & 1, l, _srl(chunk, 1)],
                            out_sems.at[l],
                        )
                        cp.start()
                        cp.wait()
            moved = moved + 128 * need.astype(I32)

            return (low, high, optr, moved, c1v, c2v, runv, wv)

        wv0 = wv_v[...] if (resume and not first) else jnp.zeros((lanes, 256), I32)
        carry = (low, high, optr, moved, c1v, c2v, runv, wv0)
        carry = jax.lax.fori_loop(start, stop, body, carry)
        low, high, optr, moved, c1v, c2v, runv, wv = carry

        if resume and not last:
            # No dangling input prefetch to drain: the windowed-input
            # guard (ioff + 128 < stop - start) never issues a DMA past
            # this launch's window, so nothing is in flight at exit
            # (an in-flight DMA at kernel exit kills the worker —
            # PERF_NOTES R3.10; the guard replaces the old drain).

            # spill everything the next launch needs and stop here
            regs_v[0] = low
            regs_v[1] = high
            regs_v[2] = optr
            regs_v[3] = moved
            regs_v[4] = c1v
            regs_v[5] = c2v
            regs_v[6] = runv
            regs_v[7] = zeros
            wv_v[...] = wv
            cp = pltpu.make_async_copy(regs_v, regs_st, st_sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(wv_v, wv_st, st_sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(wst, wst_st, st_sem)
            cp.start()
            cp.wait()
            olen_ref[...] = optr
            _spill_tables_out(c1, rowa, rowb, c0, c2, c1_st, small_st,
                              c2_st, st_sem, lanes)
            return

        # final 4 flush bytes (src/libbz3.c:426-433)
        ones = jnp.ones((lanes, 128), jnp.bool_)
        for _ in range(4):
            wv, optr = emit(wv, optr, low, ones)
            low = low << 8

        olen_ref[...] = optr

        # drain: move remaining carry halves (< 2 full + partial) into
        # staging and DMA every touched slot.  Stale staging bytes past
        # optr land in the padded output region — harmless.
        scal[0] = moved
        scal[1] = optr
        for l in range(lanes):
            mv0 = scal[0, l, 0]
            op = scal[1, l, 0]
            for it in range(3):  # ceil(260/128) + 1 safety
                # same capacity clamp as the maintenance loop (capped
                # output buffers; overrun rows are flagged, not DMA'd
                # out of bounds)
                mv = jnp.minimum(
                    mv0 + it * 128, jnp.int32(out_chunks * 1024 - 1024)
                )

                @pl.when(mv < op)
                def _():
                    chunk = _srl(mv, 10)
                    sub = _srl(mv, 7) & 7
                    sel = _srl(mv, 7) & 1
                    wst[chunk & 1, l, sub, :] = wv_half(wv, l, sel)
                    cp = pltpu.make_async_copy(
                        wst.at[chunk & 1, l],
                        hbm_out.at[chunk & 1, l, _srl(chunk, 1)],
                        out_sems.at[l],
                    )
                    cp.start()
                    cp.wait()

    return kernel


@partial(jax.jit, static_argnames=("lanes", "n_steps", "out_chunks", "interpret", "spec", "ablate"))
def _encode_call(data, ilens, lanes, n_steps, out_chunks, interpret, spec=False, ablate=''):
    kern = _make_encode_kernel(lanes, n_steps, out_chunks, spec_mul=spec, ablate=ablate)
    out, olens = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((2, lanes, out_chunks // 2, 8, 128), I32),
            jax.ShapeDtypeStruct((lanes, 128), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((lanes, 256, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 8, 128), I32),
            pltpu.VMEM((3, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            *_c0_shapes(lanes),
            *_c2_shapes(lanes),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((lanes,)),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(ilens[:, None].astype(I32), (lanes, 128)),
        data,
    )
    return out, olens


@partial(jax.jit, static_argnames=(
    "lanes", "n_steps", "out_chunks", "interpret", "spec", "first", "last",
    "ablate"),
    donate_argnums=(3, 4, 5, 6, 7, 8, 9))
def _encode_call_resume(data, ilens, startstop, out_prev, c1s, smalls,
                        c2s, regs, wv, wstb,
                        lanes, n_steps, out_chunks, interpret, spec,
                        first, last, ablate=''):
    """One launch of the RESUMABLE encode (steps [start, stop) from the
    SMEM startstop pair); all state arrays are input-output aliased —
    and DONATED at the jit boundary (see _decode_call_resume note:
    without donation every launch copies the whole carried state,
    which at 511 MiB blocks was an assured OOM)."""
    kern = _make_encode_kernel(lanes, n_steps, out_chunks, spec_mul=spec,
                               resume=True, first=first, last=last,
                               ablate=ablate)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((2, lanes, out_chunks // 2, 8, 128), I32),
            jax.ShapeDtypeStruct((lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, 256, 128), I32),
            jax.ShapeDtypeStruct((10, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, _C2_SUM), I32),
            jax.ShapeDtypeStruct((8, lanes, 128), I32),
            jax.ShapeDtypeStruct((lanes, 256), I32),
            jax.ShapeDtypeStruct((2, lanes, 8, 128), I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ilen
            pl.BlockSpec(memory_space=pltpu.SMEM),   # startstop (1,2)
            pl.BlockSpec(memory_space=pl.ANY),       # hbm_in
            pl.BlockSpec(memory_space=pl.ANY),       # out_prev (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c1 state (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # small state (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # c2 state (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # regs (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # wv (alias)
            pl.BlockSpec(memory_space=pl.ANY),       # wst (alias)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={3: 0, 4: 2, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7},
        scratch_shapes=[
            pltpu.VMEM((lanes, 256, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 8, 128), I32),
            pltpu.VMEM((3, lanes, 128), I32),
            pltpu.VMEM((2, lanes, 128), I32),
            *_c0_shapes(lanes),
            *_c2_shapes(lanes),
            pltpu.VMEM((8, lanes, 128), I32),
            pltpu.VMEM((lanes, 256), I32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((lanes,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        jnp.broadcast_to(ilens[:, None].astype(I32), (lanes, 128)),
        startstop,
        data,
        out_prev, c1s, smalls, c2s, regs, wv, wstb,
    )
    return outs


@partial(jax.jit, static_argnames=("lanes", "cs"))
def _stage_window(src_u8, s, lanes, cs):
    """Slice one launch window from the REAL-rows source and pad the
    lane axis on the fly: src holds only the rows that exist (a single
    128-511 MiB block keeps 0.5 GiB staged instead of the 4 GiB
    8-lane-padded buffer that OOM'd the 511 MiB hybrid)."""
    rows = src_u8.shape[0]
    win = jax.lax.dynamic_slice(src_u8, (0, s), (rows, cs)).astype(I32)
    if rows < lanes:
        win = jnp.concatenate(
            [win, jnp.zeros((lanes - rows, cs), I32)], axis=0
        )
    return win


def _encode_resumable(src_u8, il, lanes, n_steps, out_chunks, interpret, spec,
                      ablate=''):
    """Multi-launch encode for blocks whose single launch would trip
    the kernel-duration watchdog (PERF_NOTES R3.8).

    ``src_u8``: [rows, n_pad] uint8 (REAL rows only; n_pad a multiple
    of the launch chunk).  Each launch stages only ITS step window as
    i32, lane-padded on the fly (~512 MiB at 8 lanes).  For big
    blocks the dispatch loop THROTTLES every other launch: async
    dispatch otherwise piles up every launch's window buffer before
    the device has executed any of them (32 x 0.5 GiB at 511 MiB —
    the other half of the R5 OOM)."""
    out_buf = jnp.zeros((2, lanes, out_chunks // 2, 8, 128), I32)
    c1s = jnp.zeros((lanes, 256, 128), I32)
    smalls = jnp.zeros((10, lanes, 128), I32)
    c2s = jnp.zeros((lanes, _C2_SUM), I32)
    regs = jnp.zeros((8, lanes, 128), I32)
    wv = jnp.zeros((lanes, 256), I32)
    wstb = jnp.zeros((2, lanes, 8, 128), I32)
    cs = _chunk_steps(lanes)
    starts = list(range(0, n_steps, cs))
    # keep at most ~2 launch windows in flight once they are big
    throttle = len(starts) > 4 and lanes * cs * 4 > (1 << 28)
    olens = None
    for j, s in enumerate(starts):
        e = min(s + cs, n_steps)
        win = _stage_window(src_u8, s, lanes=lanes, cs=cs)
        ss = jnp.asarray(np.array([[s, e]], np.int32))
        (out_buf, olens, c1s, smalls, c2s, regs, wv, wstb) = _encode_call_resume(
            win, il, ss, out_buf, c1s, smalls, c2s, regs, wv, wstb,
            lanes=lanes, n_steps=n_steps, out_chunks=out_chunks,
            interpret=interpret, spec=spec,
            first=(j == 0), last=(j == len(starts) - 1), ablate=ablate,
        )
        if throttle and (j & 1):
            # dependent scalar pull (block_until_ready is unreliable
            # through the tunnel, R3.0)
            np.asarray(olens[:1, :1])
    return out_buf, olens


def cm_encode_pallas_batch(
    data: jax.Array,
    lengths: jax.Array,
    out_width: int | None = None,
    lanes: int | None = None,
    interpret: bool | None = None,
    spec: bool | None = None,
):
    """Drop-in for cm_encode_batch via the Pallas lane kernel.

    data: [K, N] uint8.  Returns (out [K, W] uint8, out_lens [K] i32)
    with W = out_width or N + N//8 + 64 (cm_encode_batch's contract).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lanes = _pick_lanes(data.shape[0], lanes, cap_default=32)
    if spec is None:
        spec = os.environ.get("BZ3_TPU_SPEC_MUL", "1") == "1"
    k_dim, n = data.shape
    w = out_width if out_width is not None else n + n // 8 + 64
    n_steps = max(128, -(-n // 128) * 128)
    out_chunks = -(-(w + 1536) // 1024)  # 1 KiB chunks with drain slack
    if out_chunks % 2:
        out_chunks += 1
    w_pad = out_chunks * 1024
    outs = []
    lens_out = []
    for g in range(0, k_dim, lanes):
        rows = min(lanes, k_dim - g)
        il = jnp.zeros((lanes,), I32).at[:rows].set(lengths[g : g + rows].astype(I32))
        if n_steps > _chunk_steps(lanes) or os.environ.get("BZ3_TPU_CM_RESUME", "0") == "1":
            cs = _chunk_steps(lanes)
            n_pad = -(-n_steps // cs) * cs
            # REAL rows only — lane padding happens per launch window
            # (_stage_window), not in this whole-block buffer
            src = jnp.zeros((rows, n_pad), jnp.uint8)
            src = src.at[:, :n].set(data[g : g + rows].astype(jnp.uint8))
            out, olens = _encode_resumable(
                src, il, lanes, n_steps, out_chunks, interpret, spec,
                ablate=_ablate(),
            )
        else:
            arr = jnp.zeros((lanes, n_steps), I32)
            arr = arr.at[:rows, :n].set(data[g : g + rows].astype(I32))
            out, olens = _encode_call(arr, il, lanes, n_steps, out_chunks,
                                      interpret, spec, ablate=_ablate())
        # unsplit the slot-major 5-D output back to [rows, w_pad] —
        # slicing the real rows BEFORE the transpose/reshape keeps the
        # materialized copy at rows/lanes of the padded size (a single
        # 128 MiB block pads to 8 lanes: 4.8 GiB -> 0.6 GiB here)
        out = out[:, :rows].transpose(1, 2, 0, 3, 4).reshape(rows, w_pad)
        outs.append(out[:, :w].astype(jnp.uint8))
        lens_out.append(olens[:rows, 0])
    if len(outs) > 1:
        return jnp.concatenate(outs, axis=0), jnp.concatenate(lens_out, axis=0)
    return outs[0], lens_out[0]
