"""Batched mRLE on device.

The reference's mrlec/mrled (src/libbz3.c:259-329) are byte-serial
two-pass loops; here both directions are fixed-shape array programs:

Encode: run segmentation (diff + segmented cummax), per-byte-value gain
histogram (one scatter-add), then output emission by *inverse* mapping —
every output position finds its source run with a binary search over
the exclusive prefix sum of per-run emission lengths.  No sequential
dependence anywhere.

Decode: the only serial part of mrled is knowing whether a byte is a
run header, a literal, or a length/continuation byte — a 2-state DFA
(NORMAL / IN-LENGTH).  DFA transition functions compose associatively,
so the per-position state comes from one ``associative_scan`` over
2-state maps; after that, run totals and the output gather are again
fully parallel.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _seg_cummax(x, axis=1):
    return jax.lax.cummax(x, axis=axis)


@partial(jax.jit, static_argnames=("out_width",))
def rle_encode_batch(data, lengths, out_width=None):
    """mrlec for each row.  data [K, N] u8 -> (out [K, W] u8, out_lens [K]).

    A row "fails" (encoder not applicable / expands) exactly when the
    reference's output would not shrink; the caller compares out_lens
    against lengths, like src/libbz3.c:609-614.
    """
    k_dim, n = data.shape
    w = out_width if out_width is not None else n + 64
    bidx = jnp.arange(k_dim)[:, None]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (k_dim, n))
    lens = lengths[:, None]
    valid = pos < lens
    b = data.astype(jnp.int32)

    prev = jnp.concatenate([jnp.full((k_dim, 1), -1, jnp.int32), b[:, :-1]], axis=1)
    is_start = (pos == 0) | (b != prev)
    is_start = is_start & valid
    # position within the run (0 at start)
    start_pos = jnp.where(is_start, pos, 0)
    runpos = pos - _seg_cummax(start_pos)
    is_rep = valid & (runpos > 0)

    # Pass 1: gains.  +1 per repeat except every 255th, -1 per start.
    inc = (is_rep & (runpos % 255 != 0)).astype(jnp.int32)
    dec = is_start.astype(jnp.int32)
    gains = jnp.zeros((k_dim, 256), jnp.int32)
    gains = gains.at[
        jnp.broadcast_to(bidx, (k_dim, n)), jnp.where(valid, b, 0)
    ].add(jnp.where(valid, inc - dec, 0))
    gate = gains > 0  # [K, 256]

    # 32-byte bitmap: bit j of byte i <=> gate[i*8+j].
    gate_bits = gate.reshape(k_dim, 32, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :]
    bitmap = jnp.sum(gate_bits * weights, axis=2).astype(jnp.uint8)  # [K, 32]

    # Pass 2: per-run emission lengths and offsets.
    run_id = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1  # [K, N]
    n_runs = run_id[:, -1] + jnp.where(lengths > 0, 1, 0)
    # run start index per run slot (runs padded to N slots)
    run_start = jnp.full((k_dim, n), n, jnp.int32)
    run_start = run_start.at[
        jnp.broadcast_to(bidx, (k_dim, n)), jnp.where(is_start, run_id, n)
    ].set(pos, mode="drop")
    run_end = jnp.concatenate([run_start[:, 1:], jnp.full((k_dim, 1), n, jnp.int32)], axis=1)
    run_end = jnp.minimum(run_end, lens)
    run_len = jnp.maximum(run_end - jnp.minimum(run_start, lens), 0)
    run_val = jnp.take_along_axis(b, jnp.minimum(run_start, n - 1), axis=1)
    run_gated = jnp.take_along_axis(gate, run_val, axis=1)
    cnt255 = jnp.maximum(run_len - 1, 0) // 255
    emit = jnp.where(
        run_len > 0, jnp.where(run_gated, 2 + cnt255, run_len), 0
    )  # [K, N] per-run output bytes

    csum = jnp.cumsum(emit, axis=1)
    offsets = jnp.concatenate([jnp.zeros((k_dim, 1), jnp.int32), csum[:, :-1]], axis=1)
    total = csum[:, -1] + 32

    # Inverse mapping: output position o (beyond the 32-byte bitmap)
    # belongs to run r = searchsorted(csum, o, 'right').
    opos = jnp.broadcast_to(jnp.arange(w - 32, dtype=jnp.int32), (k_dim, w - 32))
    rid = jax.vmap(lambda c, o: jnp.searchsorted(c, o, side="right"))(csum, opos)
    rid = jnp.minimum(rid, n - 1)
    d = opos - jnp.take_along_axis(offsets, rid, axis=1)
    r_val = jnp.take_along_axis(run_val, rid, axis=1)
    r_gated = jnp.take_along_axis(run_gated, rid, axis=1)
    r_len = jnp.take_along_axis(run_len, rid, axis=1)
    r_cnt = jnp.take_along_axis(cnt255, rid, axis=1)
    gated_byte = jnp.where(
        d == 0,
        r_val,
        jnp.where(d <= r_cnt, 255, jnp.maximum(r_len - 1, 0) % 255),
    )
    body = jnp.where(r_gated, gated_byte, r_val).astype(jnp.uint8)
    body = jnp.where(opos < (total - 32)[:, None], body, 0)

    out = jnp.concatenate([bitmap, body], axis=1)
    out = jnp.where(jnp.arange(w)[None, :] < total[:, None], out, 0)
    # Rows with length 0 emit just the bitmap (reference emits 32 bytes).
    return out, total


@partial(jax.jit, static_argnames=("out_width",))
def rle_decode_batch(data, in_lens, out_lens, out_width):
    """mrled for each row.  data [K, M] u8 -> (out [K, W] u8, ok [K] bool).

    ok[k] is False when the stream is shorter than the bitmap or the
    expansion does not reach out_lens[k] (mrled's error return,
    src/libbz3.c:303-329).
    """
    k_dim, m = data.shape
    w = out_width
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (k_dim, m))
    valid = pos < in_lens[:, None]
    b = data.astype(jnp.int32)

    # gate[k, v] for v = i*8+j is bit j of bitmap byte i
    gate_tbl = (
        (data[:, :32, None].astype(jnp.int32) >> jnp.arange(8)[None, None, :]) & 1
    ).reshape(k_dim, 256).astype(bool)

    body = valid & (pos >= 32)
    byte_gated = jnp.take_along_axis(gate_tbl, b, axis=1)

    # 2-state DFA maps per byte: next[s] for s in {NORMAL=0, INLEN=1}.
    # NORMAL: gated byte -> INLEN else NORMAL; INLEN: 255 -> INLEN else NORMAL.
    f0 = jnp.where(body & byte_gated, 1, 0)  # from NORMAL
    f1 = jnp.where(body & (b == 255), 1, 0)  # from INLEN
    fmap = jnp.stack([f0, f1], axis=-1)  # [K, M, 2]

    def compose(g, f):
        # (f . g): first g then f — associative_scan composes left to
        # right, state_before[i] = f[i-1] . ... . f[0]
        return jnp.take_along_axis(f, g, axis=-1)

    comp = jax.lax.associative_scan(compose, fmap, axis=1)  # [K, M, 2]
    state_after = comp[:, :, 0]  # applied to initial NORMAL
    state_before = jnp.concatenate(
        [jnp.zeros((k_dim, 1), fmap.dtype), state_after[:, :-1]], axis=1
    )

    is_header = body & (state_before == 0) & byte_gated
    is_literal = body & (state_before == 0) & (~byte_gated)
    is_lenbyte = body & (state_before == 1)
    is_term = is_lenbyte & (b != 255)

    # For each header, the terminator is the next is_term position.
    inf = jnp.int32(m + 1)
    term_idx = jnp.where(is_term, pos, inf)
    nxt_term = jax.lax.cummin(term_idx, axis=1, reverse=True)
    hdr_term = jnp.concatenate([nxt_term[:, 1:], jnp.full((k_dim, 1), inf, jnp.int32)], axis=1)
    has_term = hdr_term <= (in_lens[:, None] - 1)
    term_byte = jnp.take_along_axis(b, jnp.minimum(hdr_term, m - 1), axis=1)
    c255 = jnp.maximum(hdr_term - pos - 1, 0)
    run_total = jnp.where(has_term, 255 * c255 + term_byte + 1, 0)

    emit = jnp.where(is_literal, 1, jnp.where(is_header, run_total, 0))
    csum = jnp.cumsum(emit, axis=1)
    offsets = csum  # csum[i] = total emitted through i (inclusive)
    total = csum[:, -1]

    # Output gather: out position o comes from source index
    # searchsorted(csum, o, 'right').
    opos = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (k_dim, w))
    src = jax.vmap(lambda c, o: jnp.searchsorted(c, o, side="right"))(csum, opos)
    src = jnp.minimum(src, m - 1)
    out = jnp.take_along_axis(data, src, axis=1)
    out = jnp.where(opos < jnp.minimum(total[:, None], out_lens[:, None]), out, 0)

    ok = (in_lens >= 32) & (total >= out_lens)
    return out, ok
