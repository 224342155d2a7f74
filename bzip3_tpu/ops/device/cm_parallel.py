"""Device (JAX) parallel CM encoder.

The 3-phase decomposition proven bit-exact in ops/ref/cm_parallel.py,
as fixed-shape array programs (no mutable table state anywhere):

  A. per-slot counter chains for C0 and C1: sort the per-bit events by
     (slot, time) with `lax.sort`, then evaluate the chains.  The
     default (windowed, speculative=True) mode cuts the sorted stream
     into fixed windows evaluated in lockstep and recovers EXACT
     window-entry states by bracket relaxation + sampled entry->exit
     map composition (an associative scan over windows) — an ~E/seg
     sequential-depth cut that is exact by construction, certified by
     the 2^rate bracket-stall bound (see _chain_values_sorted).  The
     speculative=False mode is the plain full-stream segmented scan
     with a [K]-lane carry — sequential in E, kept as the simple
     reference form and the ok-flag fallback.
  B. p -> j -> C2 slots, same chain machinery (x1/x2 are adjacent
     slots of one event stream).
  C. the range coder: a scan over byte steps with a [K]-lane carry and
     per-step emission slots (stacked, not scattered), compacted with
     prefix sums + searchsorted.

Returns (out, out_lens, ok): ok[k] False when (speculative mode only)
certification failed, or a byte step emitted more than 8 bytes —
callers fall back to another engine for those blocks.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .cm import _mul_shift18

U32 = jnp.uint32
TOP = np.uint32(1 << 24)

SENT = jnp.int32(1 << 20)  # slot key for inactive (padding) events


def _counter_step(p, bit, rate: int):
    return jnp.where(bit, p + ((p ^ 65535) >> rate), p - (p >> rate))


def _chain_values_exact(slots, bits, advance, init_vals, rate: int):
    """Exact pre-event chain values: one scan over the sorted stream
    with a [K]-lane carry, resetting at slot-group starts.  Sequential
    in E but vector-wide across blocks — always exact."""
    k_dim, e_total = slots.shape
    prev = jnp.concatenate(
        [jnp.full((k_dim, 1), -2, slots.dtype), slots[:, :-1]], axis=1
    )
    is_start = slots != prev

    def step(state, xs):
        st, bt, at, it = xs
        state = jnp.where(st, it, state)
        emit = state
        nxt = _counter_step(state, bt, rate)
        return jnp.where(at, nxt, state), emit

    xs = (is_start.T, bits.T, advance.T, init_vals.T)
    _, vals = jax.lax.scan(step, jnp.zeros((k_dim,), jnp.int32), xs)
    return vals.T, jnp.ones((k_dim,), bool)


def _chain_values_sorted(
    slots, bits, advance, init_vals, rate: int, seg: int,
    max_relax_rounds: int = 8,
):
    """Pre-event chain values over a (slot, time)-sorted event stream,
    EXACT via bracketed windows + sampled-map composition.

    All [K, E] int32/bool.  Returns (vals [K, E] i32, ok [K] bool).

    The stream is cut into S = ceil(E/seg) windows evaluated in
    LOCKSTEP (scans of seg steps — a ~E/seg sequential depth cut vs
    the exact full-stream scan).  A window's entry state (the mid-
    chain counter of the slot straddling the boundary) is unknown;
    exactness is recovered in four moves:

    1. BRACKET: evaluate every window from the full counter domain
       [0, 65535] — trivially sound.  Counter steps are monotone and
       non-expansive, so a window maps an entry bracket to an exit
       bracket still containing the truth, and group starts inside a
       window reset both candidates to the exact init.
    2. RELAX: re-evaluate with window w's entry bracket <- window
       w-1's exit bracket, until certification passes or
       ``max_relax_rounds`` is hit (a while_loop: production segs
       contract 65535 -> stall in 1-2 rounds, tiny test segs take a
       few more).  Brackets shrink monotonically but STALL: s ±
       (s>>rate) steps cannot close a gap below 2^rate when the
       floors align (measured stall maxima are exactly 2^rate - 1),
       which is why candidate agreement alone could never certify
       (the old scheme's ~2% failures on real post-BWT chains).
    3. CERTIFY gap < 2^rate: ok requires every window's relaxed entry
       bracket [a, b] to satisfy b - a < 2^rate — the theoretical
       stall bound, so this passes unless a pathological window (e.g.
       one whose straddling slot only READS for the whole window)
       performs no contraction at all.
    4. COMPOSE: evaluate each window once more from ALL 2^rate
       consecutive entry samples {a, .., a + 2^rate - 1} (exits only
       — [K, S, 2^rate] state, no per-event storage), giving the
       window's exact entry->exit map on every value the bracket can
       contain.  Adjacent windows' samples align by construction
       (w+1's base is w's sample-0 exit), so maps compose exactly; a
       log-depth ``associative_scan`` of map composition yields every
       window's exact entry, and one final single-state scan emits the
       exact per-event values.
    """
    k_dim, e_total = slots.shape
    nsamp = 1 << rate
    n_seg = -(-e_total // seg)
    e_pad = n_seg * seg
    if e_pad != e_total:
        pad = e_pad - e_total
        slots = jnp.pad(slots, ((0, 0), (0, pad)), constant_values=-1)
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
        advance = jnp.pad(advance, ((0, 0), (0, pad)))
        init_vals = jnp.pad(init_vals, ((0, 0), (0, pad)))

    prev = jnp.concatenate(
        [jnp.full((k_dim, 1), -2, slots.dtype), slots[:, :-1]], axis=1
    )
    # Inactive events (SENT-keyed or padding) sort to a suffix of the
    # stream and their values are never consumed; forcing them to RESET
    # the chain keeps brackets contracted there, so a mostly-empty row
    # cannot fail certification on windows nothing reads.
    is_start = (slots != prev) | (slots < 0) | (slots >= SENT)

    def win(x):  # [K, E_pad] -> [seg, K, S] (scan-major)
        return x.reshape(k_dim, n_seg, seg).transpose(2, 0, 1)

    xs = (win(is_start), win(bits), win(advance), win(init_vals))

    def step_pair(carry, x):  # bracket/relax: two candidates, no emission
        c0, c1 = carry
        st, bt, at, it = x
        c0 = jnp.where(st, it, c0)
        c1 = jnp.where(st, it, c1)
        n0 = _counter_step(c0, bt, rate)
        n1 = _counter_step(c1, bt, rate)
        return (jnp.where(at, n0, c0), jnp.where(at, n1, c1)), None

    def shift_entries(x0, x1):
        # window w's entry candidates <- window w-1's exit bracket;
        # window 0 has no predecessor (its first event is always a
        # group start), any value works.
        z = jnp.zeros((k_dim, 1), jnp.int32)
        return (
            jnp.concatenate([z, x0[:, :-1]], axis=1),
            jnp.concatenate([z, x1[:, :-1]], axis=1),
        )

    # 1-2: bracket from the full domain, then relax until certified
    # (or the round cap, for chains a window of pure non-advancing
    # reads keeps wide — legitimately uncertifiable, callers fall
    # back).
    s0 = jnp.zeros((k_dim, n_seg), jnp.int32)
    s1 = jnp.full((k_dim, n_seg), 65535, jnp.int32)
    x0, x1 = jax.lax.scan(step_pair, (s0, s1), xs)[0]

    def relax_cond(carry):
        r, x0, x1 = carry
        a, b = shift_entries(x0, x1)
        return (r < max_relax_rounds) & ~jnp.all(b - a < nsamp)

    def relax_body(carry):
        r, x0, x1 = carry
        x0, x1 = jax.lax.scan(step_pair, shift_entries(x0, x1), xs)[0]
        return r + 1, x0, x1

    _, x0, x1 = jax.lax.while_loop(
        relax_cond, relax_body, (jnp.int32(0), x0, x1)
    )
    a, b = shift_entries(x0, x1)

    # 3: certify the stall bound.
    ok = jnp.all(b - a < nsamp, axis=1)

    # 4a: sampled-map pass — exits from every entry the bracket can
    # contain.  Samples past b are unused when certified (kept in
    # domain; counter steps never leave [0, 65535]).
    samples = jnp.minimum(
        a[:, :, None] + jnp.arange(nsamp, dtype=jnp.int32), 65535
    )  # [K, S, nsamp]

    def step_map(carry, x):
        st, bt, at, it = x
        c = jnp.where(st[..., None], it[..., None], carry)
        n = _counter_step(c, bt[..., None], rate)
        return jnp.where(at[..., None], n, c), None

    m = jax.lax.scan(step_map, samples, xs)[0]  # [K, S, nsamp]

    # 4b: compose maps left-to-right.  Exactness of the gather needs
    # left's values to lie inside right's sample range, which holds
    # for certified rows: left's exits are within [x0, x1] of its last
    # window, and right's base is that x0 (shift_entries alignment).
    def compose(left, right):
        la, lm = left
        ra, rm = right
        idx = jnp.clip(lm - ra[..., None], 0, nsamp - 1)
        return la, jnp.take_along_axis(rm, idx, axis=2)

    _, pm = jax.lax.associative_scan(compose, (a, m), axis=1)
    # exact entry of window w = composite exit of windows [0, w-1]
    # applied to window 0's (arbitrary) sample-0 entry.
    entry = jnp.concatenate([a[:, :1], pm[:, :-1, 0]], axis=1)  # [K, S]

    # 4c: final single-state exact evaluation with emission.
    def step_emit(carry, x):
        st, bt, at, it = x
        c = jnp.where(st, it, carry)
        n = _counter_step(c, bt, rate)
        return jnp.where(at, n, c), c

    _, v = jax.lax.scan(step_emit, entry, xs)  # [seg, K, S]

    v = v.transpose(1, 2, 0).reshape(k_dim, e_pad)
    return v[:, :e_total], ok


def _chain(keys, times, bits, advance, init_vals, rate: int, seg: int,
           speculative: bool = False):
    """Sort -> evaluate -> unsort.  Returns (vals in original event
    order [K, E], ok [K]).

    speculative=False uses the exact full-stream scan (sequential in
    E); True uses the windowed evaluation — ALSO exact, by bracketed
    entries + sampled-map composition (see _chain_values_sorted), with
    an ~E/seg sequential-depth cut; its ok flag reports the (near-
    impossible) bracket-stall-bound violation."""
    k_dim, e_total = keys.shape
    pos = jnp.broadcast_to(jnp.arange(e_total, dtype=jnp.int32), (k_dim, e_total))
    sk, _, sb, sa, si, sp = jax.lax.sort(
        (
            keys,
            times,
            bits.astype(jnp.int32),
            advance.astype(jnp.int32),
            init_vals,
            pos,
        ),
        num_keys=2,
        is_stable=True,
    )
    if speculative:
        vals, ok = _chain_values_sorted(
            sk, sb.astype(bool), sa.astype(bool), si, rate, seg
        )
    else:
        vals, ok = _chain_values_exact(sk, sb.astype(bool), sa.astype(bool), si, rate)
    bidx = jnp.arange(k_dim)[:, None]
    out = jnp.zeros((k_dim, e_total), jnp.int32).at[bidx, sp].set(vals)
    return out, ok


@partial(jax.jit, static_argnames=("seg", "out_width", "speculative"))
def cm_encode_parallel_batch(
    data: jax.Array,
    lengths: jax.Array,
    seg: int = 2048,
    out_width: int | None = None,
    speculative: bool = True,
):
    """Parallel CM encode of each row.  data [K, N] u8, lengths [K].

    Returns (out [K, W] u8, out_lens [K] i32, ok [K] bool).
    """
    k_dim, n = data.shape
    w = out_width if out_width is not None else n + n // 8 + 64
    n8 = n * 8
    buf = data.astype(jnp.int32)
    lens = lengths[:, None]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (k_dim, n))
    active_byte = pos < lens  # [K, N]

    # ---- per-bit derived quantities ----
    shifts = jnp.arange(7, -1, -1)
    bits = ((buf[:, :, None] >> shifts[None, None, :]) & 1).astype(bool)  # [K,N,8]
    acc = jnp.zeros((k_dim, n), jnp.int32)
    ctx_list = []
    for t in range(8):
        ctx_list.append((1 << t) | acc)
        acc = (acc << 1) | bits[:, :, t].astype(jnp.int32)
    ctx = jnp.stack(ctx_list, axis=2)  # [K, N, 8]

    zero = jnp.zeros((k_dim, 1), jnp.int32)
    c1 = jnp.concatenate([zero, buf[:, :-1]], axis=1)
    c2 = jnp.concatenate([zero, zero, buf[:, :-2]], axis=1)[:, :n]
    # run flag: run[i] = # consecutive positions with c1==c2 ending at i
    neq = c1 != c2
    last_neq = jax.lax.associative_scan(
        jnp.maximum, jnp.where(neq, pos, -1), axis=1
    )
    run = pos - last_neq
    f = (run > 2).astype(jnp.int32)  # [K, N]

    act8 = jnp.repeat(active_byte, 8, axis=1)  # [K, 8N] (byte-major x bit)
    flat_bits = bits.reshape(k_dim, n8)
    flat_ctx = ctx.reshape(k_dim, n8)
    times = jnp.broadcast_to(jnp.arange(n8, dtype=jnp.int32), (k_dim, n8))

    # ---- phase A: C0 ----
    keys0 = jnp.where(act8, flat_ctx, SENT)
    init0 = jnp.full((k_dim, n8), 1 << 15, jnp.int32)
    p0, ok0 = _chain(keys0, times, flat_bits, act8, init0, 2, seg, speculative)

    # ---- phase A: C1 (updates on row c1, reads on row c2) ----
    rep_c1 = jnp.repeat(c1, 8, axis=1)
    rep_c2 = jnp.repeat(c2, 8, axis=1)
    upd_key = jnp.where(act8, (rep_c1 << 8) | flat_ctx, SENT)
    read_key = jnp.where(act8, (rep_c2 << 8) | flat_ctx, SENT)
    keys1 = jnp.concatenate([upd_key, read_key], axis=1)
    # reads (kind 0) must see the pre-update value at the same time
    times1 = jnp.concatenate([times * 2 + 1, times * 2], axis=1)
    bits1 = jnp.concatenate([flat_bits, flat_bits], axis=1)
    adv1 = jnp.concatenate([act8, jnp.zeros_like(act8)], axis=1)
    init1 = jnp.full((k_dim, 2 * n8), 1 << 15, jnp.int32)
    v1, ok1 = _chain(keys1, times1, bits1, adv1, init1, 4, seg, speculative)
    p1, p2 = v1[:, :n8], v1[:, n8:]

    # ---- phase B: p, j, C2 ----
    p = ((p0 + p1) * 7 + p2 + p2) >> 4
    j = p >> 12
    rep_f = jnp.repeat(f, 8, axis=1)
    sse = (2 * flat_ctx + rep_f) * 17 + j  # [K, 8N]
    slots2 = jnp.concatenate([sse, sse + 1], axis=1)
    keys2 = jnp.where(jnp.concatenate([act8, act8], axis=1), slots2, SENT)
    times2 = jnp.concatenate([times, times], axis=1)
    bits2 = jnp.concatenate([flat_bits, flat_bits], axis=1)
    adv2 = jnp.concatenate([act8, act8], axis=1)
    kmod = slots2 % 17
    init2 = (kmod << 12) - (kmod == 16).astype(jnp.int32)
    v2, ok2 = _chain(keys2, times2, bits2, adv2, init2, 6, seg, speculative)
    x1, x2 = v2[:, :n8], v2[:, n8:]

    ssep = x1 + (((x2 - x1) * (p & 4095)) >> 12)
    width = (ssep * 3 + p).astype(U32)  # [K, 8N]

    # ---- phase C: range coder ----
    w_steps = width.reshape(k_dim, n, 8).transpose(1, 0, 2)  # [N, K, 8]
    b_steps = bits.transpose(1, 0, 2)  # [N, K, 8]
    a_steps = active_byte.T  # [N, K]
    slot_iota = jnp.arange(8, dtype=jnp.int32)[None, :]

    def cstep(carry, xs):
        low, high, over = carry
        wd, bt, at = xs  # [K, 8], [K, 8], [K]
        slots = jnp.zeros((k_dim, 8), jnp.uint8)
        cnt = jnp.zeros((k_dim,), jnp.int32)
        for t in range(8):
            step = _mul_shift18(high - low, wd[:, t])
            bit = bt[:, t]
            high_n = jnp.where(bit, low + step, high)
            low_n = jnp.where(bit, low, low + step + U32(1))
            low = jnp.where(at, low_n, low)
            high = jnp.where(at, high_n, high)
            for _ in range(4):
                do = at & ((low ^ high) < TOP)
                byte = (low >> U32(24)).astype(jnp.uint8)
                slots = jnp.where(
                    do[:, None] & (slot_iota == jnp.minimum(cnt, 7)[:, None]),
                    byte[:, None],
                    slots,
                )
                cnt = cnt + do.astype(jnp.int32)
                low = jnp.where(do, low << U32(8), low)
                high = jnp.where(do, (high << U32(8)) | U32(0xFF), high)
        over = over | (cnt > 8)
        return (low, high, over), (slots, cnt)

    low0 = jnp.zeros((k_dim,), U32)
    high0 = jnp.full((k_dim,), 0xFFFFFFFF, U32)
    over0 = jnp.zeros((k_dim,), bool)
    (low_f, _, overflow), (ys_slots, ys_cnt) = jax.lax.scan(
        cstep, (low0, high0, over0), (w_steps, b_steps, a_steps)
    )
    # ys_slots [N, K, 8] u8; ys_cnt [N, K]
    cnts = ys_cnt.T  # [K, N]
    csum = jnp.cumsum(cnts, axis=1)
    offsets = csum - cnts
    total = csum[:, -1]

    slots_flat = ys_slots.transpose(1, 0, 2).reshape(k_dim, n * 8)
    opos = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (k_dim, w))
    src_step = jax.vmap(lambda c, o: jnp.searchsorted(c, o, side="right"))(csum, opos)
    src_step = jnp.minimum(src_step, n - 1)
    d = opos - jnp.take_along_axis(offsets, src_step, axis=1)
    body = jnp.take_along_axis(
        slots_flat, jnp.clip(src_step * 8 + d, 0, n * 8 - 1), axis=1
    )
    # 4 flush bytes of the final low
    fl = low_f
    flush = jnp.stack(
        [(fl >> U32(24 - 8 * i)).astype(jnp.uint8) for i in range(4)], axis=1
    )  # [K, 4]
    rel = opos - total[:, None]
    is_flush = (rel >= 0) & (rel < 4)
    flush_b = jnp.take_along_axis(flush, jnp.clip(rel, 0, 3), axis=1)
    out = jnp.where(opos < total[:, None], body, 0).astype(jnp.uint8)
    out = jnp.where(is_flush, flush_b, out)
    out_lens = total + 4
    ok = ok0 & ok1 & ok2 & (~overflow) & (out_lens <= w)
    return out, out_lens, ok
