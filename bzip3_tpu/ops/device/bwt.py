"""Batched BWT on device.

Forward: batched prefix-doubling (Manber–Myers) suffix sort — log N
rounds of two-key radix sort via ``jax.lax.sort`` — instead of the
reference's recursive SA-IS (include/libsais.h:3941).  Output contract
matches libsais_bwt as invoked from src/libbz3.c:623: the BWT string of
T without sentinel plus the primary index (see ops/ref/bwt.py for the
exact index convention).

Variable lengths inside a fixed [K, N] batch are handled with the
distinct-sentinel trick: positions past a block's true length get
strictly increasing keys smaller than any real symbol, so (a) suffix
order of real positions is the true non-wrapping suffix order with
end-of-string smallest, and (b) all pad suffixes sort to a contiguous
prefix of the suffix array that is sliced off dynamically.

Inverse: the reference chases the biPSI permutation 2 bytes per step
(include/libsais.h:5069) — a serial pointer walk.  Here the LF chain is
(1) built as one batched stable counting sort, (2) jumped into at S
evenly spaced entry points computed with log2(seg) permutation
self-compositions (pointer doubling, the idea latent in the unused
libsais_unbwt_aux r-spaced decoder, include/libsais.h:5210), then
(3) walked as S parallel segments, so every scan step does a [K, S]
vector gather instead of 1 byte of serial work.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp


def _segstart_ranks(keys, pos):
    """Segment-start ranks of key tuples along the last axis, PACKED
    with the per-position unresolved bit: returns (rank*2 + unres_bit,
    per-row unresolved count).

    rank[i] = sorted index of the FIRST element of i's equal-key group
    (order-preserving with gaps).  Unlike dense ranks, these refine in
    place: splitting a group reassigns ranks only within [start, end),
    so resolved positions keep their rank forever — the property the
    compacted rounds below rely on.  The unresolved bit (group size
    > 1) rides the SAME scatter so the compaction entry needs no
    count histogram (scatter-add) + gather of its own — scatters are
    ~0.3-0.5 s per [16, 1Mi] round on chip (PERF_NOTES R3.12)."""
    k_dim, n = keys[0].shape
    s = jax.lax.sort((*keys, pos), num_keys=len(keys), is_stable=True)
    sorted_keys, sp = s[:-1], s[-1]
    change = sorted_keys[0][:, 1:] != sorted_keys[0][:, :-1]
    for a in sorted_keys[1:]:
        change = change | (a[:, 1:] != a[:, :-1])
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (k_dim, n))
    true1 = jnp.ones((k_dim, 1), bool)
    is_start = jnp.concatenate([true1, change], axis=1)
    is_start_next = jnp.concatenate([change, true1], axis=1)
    segstart = jax.lax.cummax(jnp.where(is_start, iota, 0), axis=1)
    bidx = jnp.arange(k_dim)[:, None]
    unres_bit = (~(is_start & is_start_next)).astype(jnp.int32)
    packed = jnp.zeros((k_dim, n), jnp.int32).at[bidx, sp].set(
        segstart * 2 + unres_bit
    )
    unresolved = jnp.sum(unres_bit, axis=1).astype(jnp.int32)
    return packed, unresolved


@jax.jit
def bwt_forward_batch(data: jax.Array, lengths: jax.Array):
    """BWT of each row.  data: [K, N] uint8 (zero-padded), lengths: [K].

    Returns (U [K, N] uint8, index [K] int32).  Rows with length <= 1
    are the identity with index = length.
    """
    k_dim, n = data.shape
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (k_dim, n))
    lens = lengths[:, None]

    # Initial ranks from FOUR leading symbols (two 2-symbol packed
    # keys), so prefix doubling starts at k = 4.  SIX-symbol seeds
    # (3 per key, 27 bits) were measured SLOWER on chip (4.94 vs 5.62
    # MB/s at [16x1MiB]): text 6-grams still repeat enough that no
    # full round is saved, and the wider compares cost real time.
    # Symbols are byte+1 with 0 for end-of-string (non-wrapping order,
    # end smallest); pad positions get strictly increasing negative
    # keys so they sort to a contiguous prefix in position order (the
    # distinct-sentinel trick).
    def sym(off):
        # A shifted read data[pos + off] is a STATIC SLICE, not a
        # gather (a [1, 16Mi] random gather costs ~170 ms on chip; a
        # slice is a bandwidth copy).  Positions past the row's true
        # length are zeroed by the where(), so the pad value is inert.
        if off == 0:
            v = data.astype(jnp.int32)
        else:
            v = jnp.concatenate(
                [data[:, off:], jnp.zeros((k_dim, off), data.dtype)], axis=1
            ).astype(jnp.int32)
        return jnp.where(pos + off < lens, v + 1, 0)

    padkey = pos - jnp.int32(n)  # negative, increasing
    real = pos < lens
    seed = int(os.environ.get("BZ3_TPU_BWT_SEED", "4"))
    if seed == 8:
        # EIGHT-symbol seeds from DENSE 2-gram ids: the 18-bit 2-gram
        # key histogram yields an order-preserving dense id < #distinct
        # per row; when that fits 16 bits (any real corpus — the worst
        # case is 257^2 distinct 2-grams), ids at offsets 0/2/4/6 pack
        # pairwise into TWO i32 sort keys, so the one seeding sort
        # orders full 8-grams and doubling starts at k = 8 instead
        # of 4.  Rows with >= 2^16 distinct 2-grams fall back to the
        # histogram 2-gram ranks (k = 2) via the same dynamic-k carry.
        nbuck = 1 << 18
        key2 = (sym(0) << 9) | sym(1)
        bidx0 = jnp.arange(k_dim)[:, None]
        cnt = (
            jnp.zeros((k_dim, nbuck), jnp.int32)
            .at[bidx0, jnp.where(real, key2, nbuck)]
            .add(1, mode="drop")
        )
        nz = (cnt > 0).astype(jnp.int32)
        dense = jnp.cumsum(nz, axis=1) - nz  # exclusive dense rank, [K, 2^18]
        n_distinct = dense[:, -1] + nz[:, -1]
        # id 0 is RESERVED for the (end, end) 2-gram (bucket 0 — which
        # no real position can produce, sym() is 0 only past the row's
        # length): real 2-grams take dense+1 so the end marker sorts
        # strictly below every real 2-gram.
        d2 = jnp.where(
            key2 == 0, 0, jnp.take_along_axis(dense, key2, axis=1) + 1
        )  # [K, N] <= n_distinct
        # The packed key (d2 << 16) | other must stay NON-NEGATIVE in
        # i32: ids reach n_distinct, so the guard is 15 bits, not 16 —
        # at 2^15 ids the high id's sign bit would flip and sort below
        # the pad sentinels, silently mis-ordering dense binary rows.
        fits = (n_distinct < (1 << 15))[:, None]

        def d2_at(off):
            # dense id of the 2-gram at pos+off; beyond the array the
            # 2-gram is (end, end) = bucket 0, whose exclusive dense
            # rank is 0 — so zero-padding the shift is exact.
            return jnp.concatenate(
                [d2[:, off:], jnp.zeros((k_dim, off), jnp.int32)], axis=1
            )

        key_a = jnp.where(
            real & fits, (d2 << 16) | d2_at(2), jnp.int32(0)
        )
        key_b = jnp.where(
            real & fits, (d2_at(4) << 16) | d2_at(6), jnp.int32(0)
        )
        # fallback rows compare by the raw 2-gram key only (k = 2)
        key_a = jnp.where(real & ~fits, key2, key_a)
        key_a = jnp.where(real, key_a, padkey)
        key_b = jnp.where(real, key_b, padkey)
        rank, unres = _segstart_ranks((key_a, key_b), pos)
        k_seed_dyn = jnp.where(fits[:, 0].all(), jnp.int32(8), jnp.int32(2))
        rank_seed = (rank, k_seed_dyn, unres)
    elif seed == 2:
        # HISTOGRAM seeds: segment-start ranks over the 18-bit 2-symbol
        # key need no per-element ordering at all — rank = (# keys
        # strictly smaller) = exclusive-cumsum of the key histogram,
        # which replaces the initial [K, N] sort with one scatter-add
        # into [K, 2^18] + one cumsum + one gather.  Pads keep their
        # position-order prefix ranks directly (rank = pos - len).
        nbuck = 1 << 18
        key2 = (sym(0) << 9) | sym(1)
        bidx0 = jnp.arange(k_dim)[:, None]
        cnt = (
            jnp.zeros((k_dim, nbuck), jnp.int32)
            .at[bidx0, jnp.where(real, key2, nbuck)]
            .add(1, mode="drop")
        )
        starts = jnp.cumsum(cnt, axis=1) - cnt  # exclusive
        combo = (starts << 1) | (cnt > 1)
        g = jnp.take_along_axis(combo, key2, axis=1)
        padlen0 = (jnp.int32(n) - lengths)[:, None]
        # packed rank*2 + unresolved bit, matching _segstart_ranks
        rank = jnp.where(
            real, (padlen0 + (g >> 1)) * 2 + (g & 1), (pos - lens) * 2
        )
        unres = jnp.sum((g & 1) & real, axis=1).astype(jnp.int32)
        k_seed = 2
    elif seed == 3:
        # THREE symbols pack into ONE non-negative i32 key (27 bits):
        # a 2-operand initial sort instead of 3, at the cost of
        # starting doubling at k = 3 (12 after one stride-4 round,
        # vs 16 with 4-symbol seeds).
        key3 = jnp.where(
            real, (sym(0) << 18) | (sym(1) << 9) | sym(2), padkey
        )
        rank, unres = _segstart_ranks((key3,), pos)
        k_seed = 3
    else:
        key_a = jnp.where(real, (sym(0) << 9) | sym(1), padkey)
        key_b = jnp.where(real, (sym(2) << 9) | sym(3), padkey)
        rank, unres = _segstart_ranks((key_a, key_b), pos)
        k_seed = 4
    bidx = jnp.arange(k_dim)[:, None]

    # stride < 2 would never refine ranks (infinite while_loop).
    stride = max(2, int(os.environ.get("BZ3_TPU_BWT_STRIDE", "4")))
    # Full rounds use a WIDER stride than the compacted rounds: their
    # k-spaced rank reads are dynamic slices (near-free), so an extra
    # operand costs only sort compare width (~70 ms/operand at 16Mi)
    # while multiplying the per-round resolution.  Swept on chip post
    # slice-fix at [1, 16Mi]: 4 -> 7.6, 5 -> 7.0, 6 -> 9.5 (with
    # div 6), 7 -> 9.1, 8 -> 7.4 MB/s; at [16, 1Mi] stride 6 measures
    # 21.8 vs 14.2.  Compact rounds keep stride 4 — their rank reads
    # are genuine random gathers, the old economics.
    stride_full = max(
        2, int(os.environ.get("BZ3_TPU_BWT_STRIDE_FULL", "6"))
    )
    # Very wide rows: each full-round sort materializes (stride_full+1)
    # int32 operands of the batch shape twice (sort in+out) — at
    # n >= 96 Mi that is the HBM peak of the whole pipeline, so narrow
    # the stride unless the env pinned it explicitly.
    if n >= (int(os.environ.get("BZ3_TPU_BWT_WIDE_MIB", "96")) << 20) and (
        "BZ3_TPU_BWT_STRIDE_FULL" not in os.environ
    ):
        stride_full = 4
    # Compacted-round capacity: once every row's unresolved-position
    # count fits in C, refinement rounds sort only those positions
    # ([K, C] keys) instead of the whole batch.  On text the initial
    # 4-symbol ranks plus ONE full stride-4 round resolve all but the
    # repeated-phrase tail, so the remaining log_4 rounds cost ~C/N of
    # a full sort each — which also neutralizes slowest-row gating
    # (extra rounds forced by one hard row are nearly free).  Env
    # BZ3_TPU_BWT_COMPACT is the N/C divisor (0 disables).  Round-4
    # re-sweep at [1, 16Mi] with per-variant cache clearing (the older
    # sweeps unknowingly reused one compiled config, PERF_NOTES R4.5):
    # div 12 = 10.15 MB/s vs div 6 = 9.48, div 3 = 8.22, compact OFF =
    # 7.21 — an extra full round before compacting beats compacting a
    # 2x larger set, because the full round's rank reads are dynamic
    # SLICES while compact-round reads are genuine gathers.  Compact
    # stride stays 4 (2 -> 9.19, 8 -> 8.69).
    div = int(os.environ.get("BZ3_TPU_BWT_COMPACT", "12"))
    cap = min(n, max(128, n // div)) if div > 0 else 0

    def cond_full(carry):
        rank, k, unres = carry
        return (unres.max() > cap) & (k < n)

    def body_full(carry):
        rank_p, k, _ = carry
        rank = rank_p >> 1  # strip the packed unresolved bit

        # Generalized doubling with STRIDE s (Larsson–Sadakane
        # widened): sorting by (r_i, r_{i+k}, .., r_{i+(s-1)k}) orders
        # prefixes of length s*k, so each O(N log N) sort round
        # multiplies the resolved prefix by s — log_s rounds instead
        # of log2 for the same per-round sort cost class (the sort is
        # the measured wall).  Stride 4 measured best on chip (8 adds
        # key-compare cost faster than it removes rounds).
        #
        # rank[pos + off] is a DYNAMIC SLICE of a (-1)-padded double
        # buffer, not a gather: off = i*k is traced, but the read is a
        # contiguous shifted window.  Measured at [1, 16Mi]: a random
        # gather costs ~170 ms/round/operand; the slice is a bandwidth
        # copy (~5 ms).  off >= n degenerates correctly: dynamic_slice
        # clamps the start to n, yielding the all-(-1) pad half.
        ext = jnp.concatenate(
            [rank, jnp.full((k_dim, n), -1, jnp.int32)], axis=1
        )

        def rank_at(off):
            return jax.lax.dynamic_slice(ext, (0, off), (k_dim, n))

        rks = [rank] + [rank_at(i * k) for i in range(1, stride_full)]
        new_rank, unres = _segstart_ranks(rks, pos)
        return new_rank, k * stride_full, unres

    rank, k_reached, unres = jax.lax.while_loop(
        cond_full,
        body_full,
        rank_seed if seed == 8 else (rank, jnp.int32(k_seed), unres),
    )

    if cap > 0:
        # ---- compacted refinement rounds --------------------------------
        # Gather the (<= cap per row) unresolved positions once; their
        # segments are wholly contained in the compacted set (a group is
        # either all-resolved or all-unresolved), so in-segment
        # refinement is exact: new_rank = segment_start_rank + offset of
        # the sub-group's first entry within the sorted segment.
        # The unresolved mask comes straight from the packed rank bit
        # (no count histogram), and the WHOLE phase — including this
        # setup's scatter — is skipped via lax.cond when the full
        # rounds already resolved every row (the common case on text:
        # measured 0.98 s of a 3.49 s [16 x 1Mi] forward was spent
        # here building compaction state for zero compact rounds).
        def compact_phase(rank_p):
            unresolved = (rank_p & 1) == 1
            rank = rank_p >> 1
            slot = jnp.cumsum(unresolved.astype(jnp.int32), axis=1) - 1
            comp = (
                jnp.full((k_dim, cap), n, jnp.int32)
                .at[bidx, jnp.where(unresolved, jnp.minimum(slot, cap), cap)]
                .set(pos, mode="drop")
            )
            iota_c = jnp.broadcast_to(
                jnp.arange(cap, dtype=jnp.int32), (k_dim, cap)
            )
            pad = comp >= n

            def cond_comp(carry):
                rank, k, done = carry
                return (~done) & (k < n)

            def body_comp(carry):
                rank, k, _ = carry
                r0 = jnp.take_along_axis(rank, jnp.minimum(comp, n - 1), axis=1)
                # pads get unique keys ABOVE every real rank (< n): they
                # sort to the tail as singletons and never affect
                # refinement.
                r0 = jnp.where(pad, n + iota_c, r0)

                def rank_at(off):
                    idxp = comp + off
                    v = jnp.take_along_axis(
                        rank, jnp.clip(idxp, 0, n - 1), axis=1
                    )
                    return jnp.where(pad | (idxp >= n), jnp.int32(-1), v)

                keys = [r0] + [rank_at(i * k) for i in range(1, stride)]
                s = jax.lax.sort((*keys, comp), num_keys=stride, is_stable=True)
                sk, comp_s = s[:-1], s[-1]
                seg_change = sk[0][:, 1:] != sk[0][:, :-1]
                sub_change = seg_change
                for a in sk[1:]:
                    sub_change = sub_change | (a[:, 1:] != a[:, :-1])
                true1 = jnp.ones((k_dim, 1), bool)
                seg_start = jax.lax.cummax(
                    jnp.where(jnp.concatenate([true1, seg_change], 1), iota_c, 0),
                    axis=1,
                )
                sub_start = jax.lax.cummax(
                    jnp.where(jnp.concatenate([true1, sub_change], 1), iota_c, 0),
                    axis=1,
                )
                new_rank_s = sk[0] + (sub_start - seg_start)
                rank2 = rank.at[bidx, comp_s].set(new_rank_s, mode="drop")
                done = jnp.all(sub_change)
                return rank2, k * stride, done

            out, _, _ = jax.lax.while_loop(
                cond_comp, body_comp, (rank, k_reached, jnp.bool_(False))
            )
            return out

        rank = jax.lax.cond(
            unres.max() > 0, compact_phase, lambda rp: rp >> 1, rank
        )
    else:
        rank = rank >> 1

    # Output DIRECTLY from ranks: the sentinel-augmented BWT's row 0 is
    # the sentinel rotation (last byte = data[len-1]); the real suffix
    # with real rank q = rank - padlen lands at output slot q + (q < p)
    # — one slot below p is skipped because suffix 0's own row is where
    # the sentinel sits in the un-augmented convention (see
    # ops/ref/bwt.py for the index convention; parity with
    # libsais_bwt as called from src/libbz3.c:623).  Scattering the
    # predecessor bytes by slot replaces the old SA scatter + two
    # dependent gathers + the argmin that located suffix 0 (its rank
    # is just rank[:, 0]) — three full-array passes removed.
    padlen = jnp.int32(n) - lengths  # [K]
    p = rank[:, 0:1] - padlen[:, None]  # rank of suffix 0 among real
    q = rank - padlen[:, None]
    slot = q + (q < p).astype(jnp.int32)
    pred = jnp.concatenate([data[:, :1], data[:, :-1]], axis=1)  # data[i-1]
    valid = real & (q != p)  # pads and suffix 0 do not emit
    u = (
        jnp.zeros((k_dim, n), jnp.uint8)
        .at[bidx, jnp.where(valid, slot, n)]
        .set(pred, mode="drop")
    )
    last = jnp.take_along_axis(data, jnp.clip(lens - 1, 0, n - 1), axis=1)  # [K,1]
    u = jnp.where(pos == 0, last, u)
    u = jnp.where(pos < lens, u, jnp.uint8(0))

    idx = p[:, 0] + 1
    # Degenerate rows: length <= 1 is the identity with index = length.
    tiny = lengths <= 1
    u = jnp.where(tiny[:, None], data, u)
    idx = jnp.where(tiny, lengths, idx)
    return u, idx


@partial(jax.jit, static_argnames=("segments",))
def bwt_inverse_batch(
    u: jax.Array, lengths: jax.Array, indices: jax.Array, segments: int | None = None
):
    """Invert the BWT for each row.  u: [K, N] uint8, returns [K, N] uint8.

    ``segments`` parallel chain walkers per row; each walks
    ceil((N+1)/segments) steps of [K, segments]-wide gathers.  The
    default targets a walker SPAN of 128 chain positions (256 past
    4 MiB rows, where the sequential entry-point scan starts to
    dominate): measured on chip, deeper segment counts kept winning
    well past the old 16K cap because each LF-power squaring is a full
    [K, m] gather — fewer squarings beats both the longer entry scan
    and the shorter walk ([16 x 1 MiB]: 5.6 -> 7.4 MB/s, [1 x 16 MiB]:
    6.2 -> 7.1).  Corrupted (length, index) pairs produce garbage
    bytes, never out-of-bounds access — the block-level CRC rejects
    them (src/libbz3.c:803).
    """
    k_dim, n = u.shape
    if segments is None:
        span = 128 if n <= (1 << 22) else 256
        segments = min(1 << 17, max(256, -(-(n + 1) // span)))
    m = n + 1  # sentinel slot
    lens = lengths[:, None]
    idxs = indices[:, None]
    jj = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (k_dim, m))

    # Sentinel-augmented string b: codes+1, 0 at `index`, pads sort last.
    u_shift = jnp.concatenate([jnp.zeros((k_dim, 1), jnp.uint8), u], axis=1)
    # (the old take_along_axis at min(jj, n) here was an IDENTITY
    # gather — jj is iota over m and min(jj, n) == jj — i.e. one full
    # random-gather pass for a plain concat, R5.3)
    before = jnp.concatenate(
        [u, jnp.zeros((k_dim, 1), jnp.uint8)], axis=1
    ).astype(jnp.int32)
    after = u_shift.astype(jnp.int32)
    b = jnp.where(jj < idxs, before + 1, jnp.where(jj == idxs, 0, after + 1))
    b = jnp.where(jj <= lens, b, jnp.int32(0x1FF))

    # LF map by one stable sort: order[r] = source row of sorted rank r,
    # so lf[order[r]] = r.
    _, order = jax.lax.sort((b, jj), num_keys=1, is_stable=True)
    bidx = jnp.arange(k_dim)[:, None]
    lf = jnp.zeros((k_dim, m), jnp.int32).at[bidx, order].set(jj)

    # Full-array random gathers run at ~11 ns/element on this backend
    # (PERF_NOTES), so the pass count IS the cost model.  The walk is
    # therefore packed stride-4: one [K, S, 3]-slice gather per step
    # yields 4 chain bytes (two 2x9-bit words) plus the 4-ahead
    # pointer, and the segment span is kept a power-of-2 multiple of 4
    # so LF**seg builds with pure squarings (one gather per level)
    # instead of compose pairs.  Build: 4 packing passes + q squarings
    # vs the previous ~2*log2(seg) compose passes.
    def comp(p, q_):  # q_[p[i]]
        return jnp.take_along_axis(q_, p, axis=1)

    if os.environ.get("BZ3_TPU_INV_FUSE", "1") == "1":
        # Node build as two VECTOR gathers instead of four scalar
        # ones: contiguous small-vector gathers amortize the HBM line
        # (measured 5.3 ns/elem in the walk vs 7.9 for single-element
        # passes, R5.3).  Gather (lf, b) at lf -> (lf2, b[lf]); then
        # (lf2, w0) at lf2 -> (lf4, w1).
        g1 = jnp.take_along_axis(
            jnp.stack([lf, b], axis=2), lf[:, :, None], axis=1
        )
        lf2 = g1[:, :, 0]
        w0 = b | (g1[:, :, 1] << 9)  # bytes at (i, lf(i))
        g2 = jnp.take_along_axis(
            jnp.stack([lf2, w0], axis=2), lf2[:, :, None], axis=1
        )
        lf4 = g2[:, :, 0]
        w1 = g2[:, :, 1]  # bytes at (lf2(i), lf3(i))
    else:
        lf2 = comp(lf, lf)
        lf4 = comp(lf2, lf2)
        w0 = b | (comp(lf, b) << 9)
        w1 = comp(lf2, w0)
    node = jnp.stack([lf4, w0, w1], axis=2)  # [K, m, 3]

    # seg = 4 * 2**q, the smallest such with ceil(m/seg) <= segments.
    want = -(-m // segments)
    q = max(0, (max(1, -(-want // 4)) - 1).bit_length())
    seg = 4 << q
    n_segs = -(-m // seg)

    p_pow = lf4
    for _ in range(q):
        p_pow = comp(p_pow, p_pow)
    p_seg = p_pow  # = LF**seg

    # Entry points e_s = LF**(s*seg)(0): S sequential single-element jumps.
    def entry_step(e, _):
        nxt = jnp.take_along_axis(p_seg, e[:, None], axis=1)[:, 0]
        return nxt, e

    _, entries = jax.lax.scan(
        entry_step, jnp.zeros((k_dim,), jnp.int32), None, length=n_segs
    )
    entries = entries.T  # [K, S]

    # Walk all segments in lockstep: 4 bytes per dependent gather.  The
    # step buffers are written K-LEADING ([K, seg/4, S] via in-place
    # dynamic-update-slice) so no transpose pass is needed afterwards —
    # the final gather's flat index absorbs the (step, segment, byte)
    # layout instead (a lax.scan would stack steps on axis 0 and force
    # a [seg/4, K, S, 4] -> [K, S, seg/4, 4] materialization).
    steps = seg // 4
    buf0 = jnp.zeros((k_dim, steps, n_segs), jnp.int32)

    def walk(t, carry):
        i_cur, v01, v23 = carry
        got = jnp.take_along_axis(node, i_cur[:, :, None], axis=1)  # [K,S,3]
        v01 = jax.lax.dynamic_update_slice(
            v01, got[:, None, :, 1], (0, t, 0)
        )
        v23 = jax.lax.dynamic_update_slice(
            v23, got[:, None, :, 2], (0, t, 0)
        )
        return got[:, :, 0], v01, v23

    _, v01, v23 = jax.lax.fori_loop(0, steps, walk, (entries, buf0, buf0))
    # flat chain offset t = s*seg + step*4 + b.  The four byte planes
    # stack on axis=1 ([K, 4, steps, S]) so the LANE-tiled minor dims
    # stay (steps, S): a trailing size-4 axis would tile 4 -> 128 lanes
    # and 32x the buffer (17 GiB at 128 Mi rows — measured OOM).
    flat0 = jnp.stack(
        [v01 & 0x1FF, v01 >> 9, v23 & 0x1FF, v23 >> 9], axis=1
    ).reshape(k_dim, 4 * steps * n_segs)

    # out[j] = chain value at t = len - 1 - j, minus 1 (the walk emits
    # right-to-left; the first visited value is the sentinel's
    # predecessor).
    t_idx = jnp.clip(lens - 1 - jj[:, :n], 0, n_segs * seg - 1)
    s_idx = t_idx // seg
    within = t_idx - s_idx * seg
    gather_idx = ((within & 3) * steps + (within >> 2)) * n_segs + s_idx
    out = jnp.take_along_axis(flat0, gather_idx, axis=1) - 1
    out = jnp.where(jj[:, :n] < lens, out, 0).astype(jnp.uint8)

    tiny = lengths <= 1
    out = jnp.where(tiny[:, None], u, out)
    return out
