"""Pallas TPU kernel for the LZP pre-pass (encode + decode).

The reference's LZP (src/libbz3.c:84-257) is a hash-dictionary byte
scanner: per position it hashes the last-4-byte context into an 18-bit
LUT of positions and either copies a literal or emits a match token —
irregular control flow with random access into the processed prefix.
That shape is hostile to the VPU (a lockstep vector formulation pays
the full match machinery every byte on every lane), so this kernel
runs it as ONE state machine per block driven by the TPU's scalar
unit: `jax.lax.while_loop`s over scalar carries with the block, the
output, and the 1 MiB LUT resident in VMEM.  Mosaic permits scalar
VMEM addressing only at 128-aligned lane offsets, so random word
access is built from native-tile primitives — a load is an (8,128)
tile read + one-hot reduce, a store a tile RMW blend (see _ld/_st).
Blocks batch over a grid (one grid step per block; the LUT is
re-zeroed per step).

This is a COMPLETENESS kernel, not a throughput engine: each access
pays a vector<->scalar sync, and grid steps are sequential — the
device pipeline uses it under BZ3_TPU_DEVICE_PREPASS=1 (self-contained
deployments), while the default path keeps the 213+ MB/s host pass
overlapped behind device compute.  Byte-exactness against
ops/ref/lzp.py (including the encoder's `heur` rejection quirk, the
word-granular + 0..3 match extension, and the base-254 length coding
with its out_cap break) is enforced by tests in interpret mode; the
identical kernel compiles for the chip.

Data is PACKED 4 bytes/word (big-endian) so VMEM holds 1 byte/byte:
unaligned 4-byte probes are two word loads + shifts, and equality of
packed words is equality of byte strings.

VMEM budget per grid step: LUT 1 MiB + input N + output ~N(+pad) —
blocks up to BZ3_TPU_LZP_MAX (default 4 MiB) run on device; the
pipeline falls back to the host pass above that.
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

LZP_BITS = 18
LZP_MASK = (1 << LZP_BITS) - 1
MIN_MATCH = 40
MATCH = 0xF2


def _hash(ctx):
    return (jax.lax.shift_right_logical(ctx, 15) ^ ctx ^ jax.lax.shift_right_logical(ctx, 3)) & LZP_MASK


def _srl(a, n):
    return jax.lax.shift_right_logical(a, n)


# NOTE: the reference's context (buf[i-1] | buf[i-2]<<8 | buf[i-3]<<16
# | buf[i-4]<<24, src/libbz3.c:131) IS the big-endian 4-byte word at
# i-4 — identical to _w32(i-4), and consistent with the incremental
# update ctx' = (ctx<<8) | b.


# Mosaic restricts SCALAR VMEM addressing to 128-aligned lane indices,
# so arbitrary scalar access is built from native-tile ops: arrays are
# [Ntiles, 8, 128] (word w -> tile w>>10, sublane (w>>7)&7, lane w&127);
# a load is a tile read + one-hot reduce, a store is a tile RMW blend.
# Each costs a vector<->scalar sync (~420 cycles, PERF_NOTES §0) — this
# kernel is completeness-grade (the pre-pass is 3% of encode wall on
# the host path), not a throughput engine.


def _ld(ref, q):
    """Scalar word load from a [T, 8, 128] VMEM ref at word index q."""
    tile = ref[_srl(q, 10)]
    subi = jax.lax.broadcasted_iota(I32, (8, 128), 0)
    lanei = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    return jnp.sum(
        jnp.where((subi == (_srl(q, 7) & 7)) & (lanei == (q & 127)), tile, 0)
    )


def _st(ref, q, v):
    t = _srl(q, 10)
    tile = ref[t]
    subi = jax.lax.broadcasted_iota(I32, (8, 128), 0)
    lanei = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    ref[t] = jnp.where(
        (subi == (_srl(q, 7) & 7)) & (lanei == (q & 127)), v, tile
    )


def _w32(ref, pos):
    """Unaligned big-endian 4-byte load at BYTE position pos."""
    q = _srl(pos, 2)
    r = pos & 3
    w0 = _ld(ref, q)
    w1 = _ld(ref, q + 1)
    sh = r * 8
    # r == 0 must not shift w1 by 32 (undefined); select instead.
    lo = jax.lax.select(r == 0, jnp.int32(0), _srl(w1, (4 - r) * 8))
    return jax.lax.select(r == 0, w0, (w0 << sh) | lo)


def _byte(ref, pos):
    q = _srl(pos, 2)
    r = pos & 3
    return _srl(_ld(ref, q), (3 - r) * 8) & 0xFF


def _st_byte(ref, pos, b):
    """Read-modify-write one byte into a packed word array."""
    q = _srl(pos, 2)
    r = pos & 3
    sh = (3 - r) * 8
    w = _ld(ref, q)
    _st(ref, q, (w & ~(jnp.int32(0xFF) << sh)) | ((b & 0xFF) << sh))


def _zero_lut(lut_ref):
    lut_ref[...] = jnp.zeros(lut_ref.shape, I32)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _make_encode_kernel(nw_in, nw_out):
    def kernel(pid, len_ref, inw_ref, outw_ref, olen_ref, lut_ref):
        _zero_lut(lut_ref)
        n = len_ref[pid, 0]
        out_cap = n - 8
        scan_end = n - MIN_MATCH - 32

        def emit(st, b):
            i, op, ctx, heur = st
            _st_byte(outw_ref, op, b)
            return (i, op + 1, ctx, heur)

        # out += buf[:4]; i = 4; ctx = bytes 3..0 little-endian
        _st(outw_ref, 0, _ld(inw_ref, 0))
        ctx0 = _ld(inw_ref, 0)

        # ---- main scan loop (src/libbz3.c:137-195 semantics) ----------
        def main_cond(st):
            i, op, ctx, heur = st
            return (i < scan_end) & (op < out_cap)

        def main_body(st):
            i, op, ctx, heur = st
            h = _hash(ctx)
            val = _ld(lut_ref, h)
            _st(lut_ref, h, i)

            def try_match(st):
                i, op, ctx, heur = st
                probe_far = _w32(inw_ref, i + MIN_MATCH - 4) == _w32(
                    inw_ref, val + MIN_MATCH - 4
                )
                probe_near = _w32(inw_ref, i) == _w32(inw_ref, val)
                # clamp: the val+heur-i read only matters when heur > i,
                # but both branches of the & evaluate — keep it in range.
                hoff = jnp.maximum(val + heur - i, 0)
                rejected = (heur > i) & (
                    _w32(inw_ref, heur) != _w32(inw_ref, hoff)
                )

                def extend(st):
                    i, op, ctx, heur = st

                    # word-granular extension
                    def ext_cond(ln):
                        return (i + ln < scan_end) & (
                            _w32(inw_ref, i + ln) == _w32(inw_ref, val + ln)
                        )

                    ln = jax.lax.while_loop(
                        ext_cond, lambda ln: ln + 4, jnp.int32(4)
                    )

                    def short(st):
                        i, op, ctx, heur = st
                        heur = jax.lax.select(heur < i + ln, i + ln, heur)
                        # fall through to the literal path below
                        return _literal(( i, op, ctx, heur), True)

                    def matched(st):
                        i, op, ctx, heur = st
                        # up to 3 extra byte extensions; a failed compare
                        # re-checks the same position (equivalent to the
                        # reference's unconditional 3x if-extend)
                        def tail_ext(_, ln):
                            ok = _byte(inw_ref, i + ln) == _byte(
                                inw_ref, val + ln
                            )
                            return jax.lax.select(ok, ln + 1, ln)

                        ln2 = jax.lax.fori_loop(0, 3, tail_ext, ln)
                        i2 = i + ln2
                        ctx2 = _w32(inw_ref, i2 - 4)
                        st2 = emit((i2, op, ctx2, heur), jnp.int32(MATCH))

                        def len_cond(c):
                            rem, st, brk = c
                            return (rem >= 254) & jnp.logical_not(brk)

                        def len_body(c):
                            rem, st, brk = c
                            st = emit(st, jnp.int32(254))
                            return rem - 254, st, st[1] >= out_cap

                        rem, st3, _ = jax.lax.while_loop(
                            len_cond, len_body, (ln2 - MIN_MATCH, st2, False)
                        )
                        return emit(st3, rem & 0xFF)

                    return jax.lax.cond(ln < MIN_MATCH, short, matched, (i, op, ctx, heur))

                take = probe_far & probe_near & jnp.logical_not(rejected)
                return jax.lax.cond(
                    take, extend, lambda st: _literal(st, True), (i, op, ctx, heur)
                )

            def _literal(st, pred_escape):
                i, op, ctx, heur = st
                b = _byte(inw_ref, i)
                st = emit((i + 1, op, ((ctx << 8) | b), heur), b)

                def esc(st):
                    return emit(st, jnp.int32(255))

                if pred_escape:
                    st = jax.lax.cond(b == MATCH, esc, lambda s: s, st)
                return st

            return jax.lax.cond(
                val > 0, try_match, lambda st: _literal(st, False), (i, op, ctx, heur)
            )

        st = jax.lax.while_loop(main_cond, main_body, (jnp.int32(4), jnp.int32(4), ctx0, jnp.int32(0)))

        # ---- tail loop: plain literals with escape semantics -----------
        i, op, ctx, heur = st
        ctx = _w32(inw_ref, i - 4)

        def tail_cond(st):
            i, op, ctx, heur = st
            return (i < n) & (op < out_cap)

        def tail_body(st):
            i, op, ctx, heur = st
            h = _hash(ctx)
            val = _ld(lut_ref, h)
            _st(lut_ref, h, i)
            b = _byte(inw_ref, i)
            st = emit((i + 1, op, ((ctx << 8) | b), heur), b)

            def esc(st):
                return emit(st, jnp.int32(255))

            return jax.lax.cond((b == MATCH) & (val > 0), esc, lambda s: s, st)

        st = jax.lax.while_loop(tail_cond, tail_body, (i, op, ctx, heur))
        i, op, ctx, heur = st

        # not applicable (too small) or expanding -> -1
        fail = (n < MIN_MATCH + 32) | (op >= out_cap)
        olen_ref[pid, 0] = jax.lax.select(fail, jnp.int32(-1), op)

    return kernel


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _make_decode_kernel(nw_in, nw_out):
    def kernel(pid, len_ref, maxout_ref, inw_ref, outw_ref, olen_ref, lut_ref):
        _zero_lut(lut_ref)
        n = len_ref[pid, 0]
        max_out = maxout_ref[pid, 0]

        _st(outw_ref, 0, _ld(inw_ref, 0))
        ctx0 = _ld(inw_ref, 0)

        # carry: ip, op, ctx, err
        def cond(st):
            ip, op, ctx, err = st
            return (ip < n) & (op < max_out) & (err == 0)

        def body(st):
            ip, op, ctx, err = st
            h = _hash(ctx)
            val = _ld(lut_ref, h)
            _st(lut_ref, h, op)
            b0 = _byte(inw_ref, ip)

            def match_path(st):
                ip, op, ctx, err = st
                ip = ip + 1

                def trunc(st):
                    ip, op, ctx, err = st
                    return (ip, op, ctx, jnp.int32(1))

                def have(st):
                    ip, op, ctx, err = st
                    b1 = _byte(inw_ref, ip)

                    def esc(st):
                        ip, op, ctx, err = st
                        _st_byte(outw_ref, op, jnp.int32(MATCH))
                        return (ip + 1, op + 1, (ctx << 8) | MATCH, err)

                    def run(st):
                        ip, op, ctx, err = st

                        # base-254 length: consume until a byte != 254.
                        # flags are i32, not bool: Mosaic's scf.if
                        # verifier rejects mixed i1/i32 branch yields.
                        def len_cond(c):
                            ip, ln, stop, err = c
                            return (stop == 0) & (err == 0)

                        def len_body(c):
                            ip, ln, stop, err = c

                            def ok(c):
                                ip, ln, stop, err = c
                                b = _byte(inw_ref, ip)
                                return ip + 1, ln + b, (b != 254).astype(jnp.int32), err

                            def bad(c):
                                ip, ln, stop, err = c
                                return ip, ln, jnp.int32(1), jnp.int32(1)

                            return jax.lax.cond(ip == n, bad, ok, c)

                        ip, ln, _, err = jax.lax.while_loop(
                            len_cond, len_body,
                            (ip, jnp.int32(MIN_MATCH), jnp.int32(0), err),
                        )

                        # overlapping forward copy from the prediction
                        end = jnp.minimum(op + ln, max_out)

                        def cp_cond(c):
                            op, ref = c
                            return (op < end) & (err == 0)

                        def cp_body(c):
                            op, ref = c
                            _st_byte(outw_ref, op, _byte(outw_ref, ref))
                            return op + 1, ref + 1

                        op, _ = jax.lax.while_loop(cp_cond, cp_body, (op, val))
                        ctx = jax.lax.select(
                            err == 0, _w32(outw_ref, op - 4), ctx
                        )
                        return (ip, op, ctx, err)

                    return jax.lax.cond(b1 == 255, esc, run, (ip, op, ctx, err))

                return jax.lax.cond(ip == n, trunc, have, (ip, op, ctx, err))

            def lit_path(st):
                ip, op, ctx, err = st
                _st_byte(outw_ref, op, b0)
                return (ip + 1, op + 1, (ctx << 8) | b0, err)

            return jax.lax.cond(
                (b0 == MATCH) & (val > 0), match_path, lit_path, (ip, op, ctx, err)
            )

        st = jax.lax.while_loop(cond, body, (jnp.int32(4), jnp.int32(4), ctx0, jnp.int32(0)))
        ip, op, ctx, err = st
        fail = (n < 4) | (err != 0)
        olen_ref[pid, 0] = jax.lax.select(fail, jnp.int32(-1), op)

    return kernel


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _pack_words(data_u8):
    """[K, N] u8 -> [K, ceil(N/4)/128*128... ] big-endian packed i32 2-D
    tiled as [K, W/128, 128]."""
    k, n = data_u8.shape
    nw = -(-n // 4)
    nw_pad = -(-(nw + 2) // 1024) * 1024  # +2 words probe margin; tile-sized
    b = jnp.zeros((k, nw_pad * 4), jnp.uint8).at[:, :n].set(data_u8)
    w = b.reshape(k, nw_pad, 4).astype(jnp.int32)
    packed = (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]
    return packed.reshape(k, nw_pad // 1024, 8, 128), nw_pad


def _unpack_words(packed, n_bytes):
    """[K, W/128, 128] i32 -> [K, n_bytes] u8."""
    k = packed.shape[0]
    w = packed.reshape(k, -1)
    b = jnp.stack(
        [
            _srl(w, 24) & 0xFF,
            _srl(w, 16) & 0xFF,
            _srl(w, 8) & 0xFF,
            w & 0xFF,
        ],
        axis=-1,
    ).reshape(k, -1)
    return b[:, :n_bytes].astype(jnp.uint8)


@partial(jax.jit, static_argnames=("nw_in", "nw_out", "interpret"))
def _encode_call(inw, lens, nw_in, nw_out, interpret):
    kern = _make_encode_kernel(nw_in, nw_out)
    k = inw.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, nw_in // 1024, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, nw_out // 1024, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1 << (LZP_BITS - 10), 8, 128), I32)],
    )

    def kernel(len_ref, inw_ref, outw_ref, olen_ref, lut_ref):
        kern(
            pl.program_id(0),
            len_ref,
            inw_ref.at[0],
            outw_ref.at[0],
            olen_ref,
            lut_ref,
        )

    outw, olens = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, nw_out // 1024, 8, 128), I32),
            jax.ShapeDtypeStruct((k, 1), I32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lens.astype(I32).reshape(k, 1), inw)
    return outw, olens[:, 0]


@partial(jax.jit, static_argnames=("nw_in", "nw_out", "interpret"))
def _decode_call(inw, lens, max_outs, nw_in, nw_out, interpret):
    kern = _make_decode_kernel(nw_in, nw_out)
    k = inw.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, nw_in // 1024, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, nw_out // 1024, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1 << (LZP_BITS - 10), 8, 128), I32)],
    )

    def kernel(len_ref, mo_ref, inw_ref, outw_ref, olen_ref, lut_ref):
        kern(pl.program_id(0), len_ref, mo_ref, inw_ref.at[0], outw_ref.at[0], olen_ref, lut_ref)

    outw, olens = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, nw_out // 1024, 8, 128), I32),
            jax.ShapeDtypeStruct((k, 1), I32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lens.astype(I32).reshape(k, 1), max_outs.astype(I32).reshape(k, 1), inw)
    return outw, olens[:, 0]


def lzp_encode_pallas_batch(data, lengths, interpret: bool | None = None):
    """LZP-encode each row.  data [K, N] u8 -> (out [K, N] u8, out_lens
    [K] i32; -1 = not applicable or expanding, matching the oracle's
    None)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    inw, nw_in = _pack_words(data)
    nw_out = nw_in  # out_cap < n
    outw, olens = _encode_call(inw, lengths, nw_in, nw_out, interpret)
    return _unpack_words(outw, data.shape[1]), olens


def lzp_decode_pallas_batch(data, in_lens, max_out: int, interpret: bool | None = None):
    """LZP-decode each row to at most max_out bytes.  Returns
    (out [K, max_out] u8, out_lens [K] i32; -1 = truncated stream)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    inw, nw_in = _pack_words(data)
    nw_out = -(-(-(-max_out // 4) + 2) // 1024) * 1024
    mo = jnp.full((data.shape[0],), max_out, I32)
    outw, olens = _decode_call(inw, in_lens, mo, nw_in, nw_out, interpret)
    return _unpack_words(outw, max_out), olens
