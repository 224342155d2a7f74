"""Phase split of the inverse BWT at [1, 16Mi] — each phase as its own
jit with forced syncs, replicating ops/device/bwt.bwt_inverse_batch.
Usage: python scripts/invprobe.py [width_mib] [span]
"""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from b16probe import corpus_exact, sync  # noqa: E402
from bzip3_tpu.ops.device.bwt import bwt_forward_batch  # noqa: E402

N = int(float(sys.argv[1]) * (1 << 20)) if len(sys.argv) > 1 else (16 << 20)
SPAN = int(sys.argv[2]) if len(sys.argv) > 2 else (128 if N <= (1 << 22) else 256)
K = 1

corpus = corpus_exact(N, 11)
data = jnp.asarray(np.frombuffer(corpus, np.uint8).reshape(1, N))
lens = jnp.full((1,), N, jnp.int32)
u, idx = bwt_forward_batch(data, lens)
sync(u, idx)

m = N + 1
segments = min(1 << 17, max(256, -(-m // SPAN)))
want = -(-m // segments)
q = max(0, (max(1, -(-want // 4)) - 1).bit_length())
seg = 4 << q
n_segs = -(-m // seg)
print(f"N={N>>20}Mi span={SPAN} segments_target={segments} seg={seg} q={q} n_segs={n_segs}", flush=True)


@jax.jit
def build_lf(u, lengths, indices):
    k_dim, n = u.shape
    lens = lengths[:, None]
    idxs = indices[:, None]
    jj = jnp.broadcast_to(jnp.arange(n + 1, dtype=jnp.int32), (k_dim, n + 1))
    u_shift = jnp.concatenate([jnp.zeros((k_dim, 1), jnp.uint8), u], axis=1)
    before = jnp.take_along_axis(
        jnp.concatenate([u, jnp.zeros((k_dim, 1), jnp.uint8)], axis=1),
        jnp.minimum(jj, n), axis=1).astype(jnp.int32)
    after = u_shift.astype(jnp.int32)
    b = jnp.where(jj < idxs, before + 1, jnp.where(jj == idxs, 0, after + 1))
    b = jnp.where(jj <= lens, b, jnp.int32(0x1FF))
    _, order = jax.lax.sort((b, jj), num_keys=1, is_stable=True)
    bidx = jnp.arange(k_dim)[:, None]
    lf = jnp.zeros((k_dim, n + 1), jnp.int32).at[bidx, order].set(jj)
    return b, lf


@jax.jit
def pack_node(b, lf):
    def comp(p, q_):
        return jnp.take_along_axis(q_, p, axis=1)
    lf2 = comp(lf, lf)
    lf4 = comp(lf2, lf2)
    w0 = b | (comp(lf, b) << 9)
    w1 = comp(lf2, w0)
    return jnp.stack([lf4, w0, w1], axis=2), lf4


@jax.jit
def squarings(lf4):
    def comp(p, q_):
        return jnp.take_along_axis(q_, p, axis=1)
    p_pow = lf4
    for _ in range(q):
        p_pow = comp(p_pow, p_pow)
    return p_pow


@jax.jit
def entry_scan(p_seg):
    def entry_step(e, _):
        nxt = jnp.take_along_axis(p_seg, e[:, None], axis=1)[:, 0]
        return nxt, e
    _, entries = jax.lax.scan(
        entry_step, jnp.zeros((K,), jnp.int32), None, length=n_segs)
    return entries.T


@jax.jit
def walk(node, entries):
    steps = seg // 4
    buf0 = jnp.zeros((K, steps, n_segs), jnp.int32)

    def step(t, carry):
        i_cur, v01, v23 = carry
        got = jnp.take_along_axis(node, i_cur[:, :, None], axis=1)
        v01 = jax.lax.dynamic_update_slice(v01, got[:, None, :, 1], (0, t, 0))
        v23 = jax.lax.dynamic_update_slice(v23, got[:, None, :, 2], (0, t, 0))
        return got[:, :, 0], v01, v23

    _, v01, v23 = jax.lax.fori_loop(0, steps, step, (entries, buf0, buf0))
    return jnp.stack([v01 & 0x1FF, v01 >> 9, v23 & 0x1FF, v23 >> 9], axis=-1
                     ).reshape(K, steps * n_segs * 4)


@jax.jit
def final(flat0, lengths):
    lens = lengths[:, None]
    jj = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (K, N))
    t_idx = jnp.clip(lens - 1 - jj, 0, n_segs * seg - 1)
    s_idx = t_idx // seg
    within = t_idx - s_idx * seg
    gi = ((within >> 2) * n_segs + s_idx) * 4 + (within & 3)
    out = jnp.take_along_axis(flat0, gi, axis=1) - 1
    return jnp.where(jj < lens, out, 0).astype(jnp.uint8)


def tphase(name, fn, *args):
    out = fn(*args)
    sync(*(out if isinstance(out, tuple) else (out,)))
    t0 = time.time()
    out = fn(*args)
    sync(*(out if isinstance(out, tuple) else (out,)))
    print(f"{name}: {(time.time()-t0)*1000:.0f} ms", flush=True)
    return out


b, lf = tphase("build_lf (b + sort + scatter)", build_lf, u, lens, idx)
node, lf4 = tphase("pack_node (4 gathers + stack)", pack_node, b, lf)
p_seg = tphase(f"squarings (q={q} gathers)", squarings, lf4)
entries = tphase(f"entry_scan ({n_segs} steps)", entry_scan, p_seg)
flat0 = tphase(f"walk ({seg//4} steps x {n_segs} wide)", walk, node, entries)
out = tphase("final gather", final, flat0, lens)
assert bytes(np.asarray(out)[0]) == corpus, "inverse mismatch"
print("exact", flush=True)
