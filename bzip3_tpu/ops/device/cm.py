"""Batched context-mixing arithmetic coder on device.

Bit-exact re-architecture of the reference coder (src/libbz3.c:331-494)
as K interleaved lanes: the sequential bit-model recurrence is kept
per lane (the format demands it) and throughput comes from coding K
independent blocks in lockstep — every scan step performs K bit-codes
worth of vector ALU work, gathers and scatters on the VPU, exactly the
"lane interleaving" plan of SURVEY.md §7.4.

Model state per lane (mirrors `state` in src/libbz3.c:333-342):
  C0[256], C1[256*256], C2[512*17]  adaptive u16 counters
  low/high 32-bit range, c1/c2 previous bytes, run counter.

The reference computes the range split with a 64-bit product
((u64)(high-low) * (ssep*3+p)) >> 18.  TPUs are 32-bit machines, so
`_mul_shift18` reproduces it exactly with 16-bit limb products and
explicit carries — no uint64 anywhere.

The renormalization loop ("while (low^high) < 2^24 emit a byte") runs
at most 4 times per bit, so it is unrolled 4x with per-lane masks and
out-of-bounds-dropping scatters for inactive lanes.

This is the jit/scan formulation — correct for any size, used for
tests, the multi-chip dryrun and small blocks.  The Pallas VMEM-resident
kernel shares these exact step semantics.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
TOP = np.uint32(1 << 24)


def cm_fresh_tables(k_dim: int):
    """Per-lane model tables (src/libbz3.c:350-358)."""
    c0 = jnp.full((k_dim, 256), 1 << 15, dtype=jnp.uint16)
    c1t = jnp.full((k_dim, 256 * 256), 1 << 15, dtype=jnp.uint16)
    row = np.array([(k << 12) - (1 if k == 16 else 0) for k in range(17)], np.uint16)
    c2t = jnp.asarray(np.tile(row, 512)[None, :].repeat(k_dim, axis=0))
    return c0, c1t, c2t


def _mul_shift18(a, b):
    """floor((a * b) / 2**18) mod 2**32 for u32 a, b < 2**18, in u32 ops."""
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)  # < 4
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    cm = (mid < p10).astype(U32)
    s = mid + (p00 >> U32(16))
    cs = (s < mid).astype(U32)
    return (p11 << U32(14)) + ((cm + cs) << U32(30)) + (s >> U32(2))


def _predict(c0, c1t, c2t, ctx, c1, c2, f, bidx):
    """Shared prediction for one bit (src/libbz3.c:376-387)."""
    p0 = jnp.take_along_axis(c0, ctx[:, None], axis=1)[:, 0].astype(jnp.int32)
    i1 = (c1 << 8) + ctx
    i2 = (c2 << 8) + ctx
    p1 = jnp.take_along_axis(c1t, i1[:, None], axis=1)[:, 0].astype(jnp.int32)
    p2 = jnp.take_along_axis(c1t, i2[:, None], axis=1)[:, 0].astype(jnp.int32)
    p = ((p0 + p1) * 7 + p2 + p2) >> 4
    j = p >> 12
    sse = (2 * ctx + f) * 17 + j
    x1 = jnp.take_along_axis(c2t, sse[:, None], axis=1)[:, 0].astype(jnp.int32)
    x2 = jnp.take_along_axis(c2t, (sse + 1)[:, None], axis=1)[:, 0].astype(jnp.int32)
    ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
    return p, p0, p1, i1, sse, x1, x2, ssep


def _update(c0, c1t, c2t, ctx, i1, sse, p0, p1, x1, x2, bit, active, bidx):
    """Counter updates, rates 2/4/6 (update0/update1, src/libbz3.c:347-348)."""
    up0 = jnp.where(bit, p0 + ((p0 ^ 65535) >> 2), p0 - (p0 >> 2))
    up1 = jnp.where(bit, p1 + ((p1 ^ 65535) >> 4), p1 - (p1 >> 4))
    ux1 = jnp.where(bit, x1 + ((x1 ^ 65535) >> 6), x1 - (x1 >> 6))
    ux2 = jnp.where(bit, x2 + ((x2 ^ 65535) >> 6), x2 - (x2 >> 6))
    drop0 = jnp.where(active, ctx, 1 << 30)
    drop1 = jnp.where(active, i1, 1 << 30)
    drop2 = jnp.where(active, sse, 1 << 30)
    c0 = c0.at[bidx, drop0].set(up0.astype(jnp.uint16), mode="drop")
    c1t = c1t.at[bidx, drop1].set(up1.astype(jnp.uint16), mode="drop")
    c2t = c2t.at[bidx, drop2].set(ux1.astype(jnp.uint16), mode="drop")
    c2t = c2t.at[bidx, jnp.where(active, sse + 1, 1 << 30)].set(
        ux2.astype(jnp.uint16), mode="drop"
    )
    return c0, c1t, c2t


@partial(jax.jit, static_argnames=("out_width",))
def cm_encode_batch(data: jax.Array, lengths: jax.Array, out_width: int | None = None):
    """Encode each row of data[k, :lengths[k]] with a fresh CM state.

    data: [K, N] uint8.  Returns (out [K, W] uint8, out_lens [K] int32).
    W defaults to N + N//8 + 64 (the coder's true worst case is far
    below bz3_bound; slack is cheap).
    """
    k_dim, n = data.shape
    w = out_width if out_width is not None else n + n // 8 + 64
    bidx = jnp.arange(k_dim)

    c0, c1t, c2t = cm_fresh_tables(k_dim)
    out = jnp.zeros((k_dim, w), dtype=jnp.uint8)

    def renorm(low, high, out, optr, active):
        for _ in range(4):
            do = active & ((low ^ high) < TOP)
            tgt = jnp.where(do, optr, 1 << 30)
            out = out.at[bidx, tgt].set((low >> U32(24)).astype(jnp.uint8), mode="drop")
            optr = optr + do.astype(jnp.int32)
            low = jnp.where(do, low << U32(8), low)
            high = jnp.where(do, (high << U32(8)) | U32(0xFF), high)
        return low, high, out, optr

    def byte_step(carry, i):
        c0, c1t, c2t, low, high, c1, c2, run, out, optr = carry
        active = i < lengths
        c = data[:, i].astype(jnp.int32)
        run = jnp.where(active, jnp.where(c1 == c2, run + 1, 0), run)
        f = (run > 2).astype(jnp.int32)

        ctx = jnp.ones((k_dim,), jnp.int32)
        for t in range(8):
            p, p0, p1, i1, sse, x1, x2, ssep = _predict(
                c0, c1t, c2t, ctx, c1, c2, f, bidx
            )
            bit = (c & 128) != 0
            step = _mul_shift18(high - low, (ssep * 3 + p).astype(U32))
            high_1 = low + step
            low_0 = low + step + U32(1)
            low = jnp.where(bit, low, jnp.where(active, low_0, low))
            high = jnp.where(bit & active, high_1, high)
            low, high, out, optr = renorm(low, high, out, optr, active)
            c0, c1t, c2t = _update(
                c0, c1t, c2t, ctx, i1, sse, p0, p1, x1, x2, bit, active, bidx
            )
            ctx = ctx + ctx + bit.astype(jnp.int32)
            c = (c << 1) & 0xFF

        c2 = jnp.where(active, c1, c2)
        c1 = jnp.where(active, ctx & 255, c1)
        return (c0, c1t, c2t, low, high, c1, c2, run, out, optr), None

    low = jnp.zeros((k_dim,), U32)
    high = jnp.full((k_dim,), 0xFFFFFFFF, U32)
    zeros = jnp.zeros((k_dim,), jnp.int32)
    carry = (c0, c1t, c2t, low, high, zeros, zeros, zeros, out, zeros)
    carry, _ = jax.lax.scan(byte_step, carry, jnp.arange(n), unroll=1)
    c0, c1t, c2t, low, high, c1, c2, run, out, optr = carry

    for _ in range(4):  # flush (src/libbz3.c:426-433)
        out = out.at[bidx, jnp.minimum(optr, w - 1)].set(
            (low >> U32(24)).astype(jnp.uint8), mode="drop"
        )
        optr = optr + 1
        low = low << U32(8)
    return out, optr


@partial(jax.jit, static_argnames=("out_width",))
def cm_decode_batch(
    data: jax.Array, in_lens: jax.Array, out_lens: jax.Array, out_width: int
):
    """Decode out_lens[k] bytes from each row.  data: [K, M] uint8.

    Exhausted input shifts in 0xFF bytes, matching read_in's -1
    (src/libbz3.c:346,437-440).
    """
    k_dim, m = data.shape
    bidx = jnp.arange(k_dim)

    c0, c1t, c2t = cm_fresh_tables(k_dim)
    out = jnp.zeros((k_dim, out_width), dtype=jnp.uint8)

    def read(ip):
        byte = jnp.take_along_axis(data, jnp.minimum(ip, m - 1)[:, None], axis=1)[
            :, 0
        ].astype(U32)
        byte = jnp.where(ip < in_lens, byte, U32(0xFFFFFFFF))
        return byte, ip + 1

    low = jnp.zeros((k_dim,), U32)
    high = jnp.full((k_dim,), 0xFFFFFFFF, U32)
    code = jnp.zeros((k_dim,), U32)
    ip = jnp.zeros((k_dim,), jnp.int32)
    for _ in range(4):
        byte, ip = read(ip)
        code = (code << U32(8)) + byte

    def renorm(low, high, code, ip, active):
        for _ in range(4):
            do = active & ((low ^ high) < TOP)
            byte, ip_n = read(ip)
            low = jnp.where(do, low << U32(8), low)
            high = jnp.where(do, (high << U32(8)) | U32(0xFF), high)
            code = jnp.where(do, (code << U32(8)) + byte, code)
            ip = jnp.where(do, ip_n, ip)
        return low, high, code, ip

    def byte_step(carry, i):
        c0, c1t, c2t, low, high, code, ip, c1, c2, run, out = carry
        active = i < out_lens
        run = jnp.where(active, jnp.where(c1 == c2, run + 1, 0), run)
        f = (run > 2).astype(jnp.int32)

        ctx = jnp.ones((k_dim,), jnp.int32)
        for t in range(8):
            p, p0, p1, i1, sse, x1, x2, ssep = _predict(
                c0, c1t, c2t, ctx, c1, c2, f, bidx
            )
            step = _mul_shift18(high - low, (ssep * 3 + p).astype(U32))
            mid = low + step
            bit = code <= mid
            high = jnp.where(bit & active, mid, high)
            low = jnp.where((~bit) & active, mid + U32(1), low)
            low, high, code, ip = renorm(low, high, code, ip, active)
            c0, c1t, c2t = _update(
                c0, c1t, c2t, ctx, i1, sse, p0, p1, x1, x2, bit, active, bidx
            )
            ctx = ctx + ctx + bit.astype(jnp.int32)

        c2 = jnp.where(active, c1, c2)
        c1 = jnp.where(active, ctx & 255, c1)
        out = out.at[bidx, jnp.where(active, i, 1 << 30)].set(
            (ctx & 255).astype(jnp.uint8), mode="drop"
        )
        return (c0, c1t, c2t, low, high, code, ip, c1, c2, run, out), None

    zeros = jnp.zeros((k_dim,), jnp.int32)
    carry = (c0, c1t, c2t, low, high, code, ip, zeros, zeros, zeros, out)
    carry, _ = jax.lax.scan(byte_step, carry, jnp.arange(out_width), unroll=1)
    return carry[-1]
