"""Cost-model probe for the -b 16 device shape.

Measures, with forced scalar syncs and fresh inputs (PERF_NOTES R3.0):
  1. raw primitive costs at [1, 16Mi]: lax.sort by operand count,
     scatter, gather, cummax;
  2. BWT forward phase split at [1, 16Mi] (seeds / full rounds /
     compact / output) via env-knob ablations;
  3. CM encode/decode at the b16 lane config ([8, 16Mi] = one bench
     wave) vs [32, 4Mi] (same bytes, lane-filled);
  4. BWT inverse at [1, 16Mi].

Usage: python scripts/b16probe.py [section ...]   (default: prims bwt)
"""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus

N = 16 << 20


def sync(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))


def timeit(name, fn, *args, reps=2):
    out = fn(*args)
    sync(*(out if isinstance(out, tuple) else (out,)))  # compile
    best = float("inf")
    for r in range(reps):
        args2 = tuple(a + 0 if isinstance(a, jax.Array) else a for a in args)
        sync(*(a for a in args2 if isinstance(a, jax.Array)))
        t0 = time.time()
        out = fn(*args2)
        sync(*(out if isinstance(out, tuple) else (out,)))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f} ms", flush=True)
    return best


def prims():
    k = jax.random.randint(jax.random.PRNGKey(0), (1, N), 0, N, jnp.int32)
    v1 = jax.random.randint(jax.random.PRNGKey(1), (1, N), 0, N, jnp.int32)
    v2 = v1 + 1
    v3 = v1 + 2
    v4 = v1 + 3
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, N), 0, N, jnp.int32)
    bidx = jnp.arange(1)[:, None]

    timeit("sort 2op (1 key)", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True)), k, v1)
    timeit("sort 3op (2 key)", jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=True)), k, v1, idx)
    timeit("sort 5op (4 key)", jax.jit(lambda a, b, c, d, e: jax.lax.sort((a, b, c, d, e), num_keys=4, is_stable=True)), k, v1, v2, v3, idx)
    timeit("gather", jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), v1, idx)
    timeit("scatter", jax.jit(lambda a, i, v: a.at[bidx, i].set(v, mode="drop")), jnp.zeros((1, N), jnp.int32), idx, v1)
    timeit("cummax", jax.jit(lambda a: jax.lax.cummax(a, axis=1)), v1)
    timeit("cumsum", jax.jit(lambda a: jnp.cumsum(a, axis=1)), v1)
    # u64-packed single-key sort (2 ranks in one key): is it cheaper?
    k64 = (k.astype(jnp.uint64) << 25) | v1.astype(jnp.uint64)
    timeit("sort u64 2op (1 key)", jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True)), k64, idx)


def corpus_exact(size, seed):
    c = make_corpus(size + (size >> 3) + (1 << 20), seed=seed)
    while len(c) < size:
        c = c + c
    return c[:size]


def bwt_fwd():
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch

    corpus = corpus_exact(N, 7)
    data = jnp.asarray(np.frombuffer(corpus, np.uint8).reshape(1, N))
    lens = jnp.full((1,), N, jnp.int32)
    t = timeit("bwt_fwd [1,16Mi]", bwt_forward_batch, data, lens)
    print(f"  = {N / (1 << 20) / t:.2f} MB/s", flush=True)


def bwt_inv():
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch

    corpus = corpus_exact(N, 8)
    data = jnp.asarray(np.frombuffer(corpus, np.uint8).reshape(1, N))
    lens = jnp.full((1,), N, jnp.int32)
    u, idx = bwt_forward_batch(data, lens)
    sync(u, idx)
    t = timeit("bwt_inv [1,16Mi]", bwt_inverse_batch, u, lens, idx)
    print(f"  = {N / (1 << 20) / t:.2f} MB/s", flush=True)


def cm(rows=8, width=N):
    from bzip3_tpu.ops.device.cm_pallas import (
        cm_encode_pallas_batch,
        cm_decode_pallas_batch,
    )
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch

    tot = rows * width
    corpus = corpus_exact(tot, 9)
    data = jnp.asarray(np.frombuffer(corpus, np.uint8).reshape(rows, width))
    lens = jnp.full((rows,), width, jnp.int32)
    # BWT first so the CM sees production-like input
    parts = [bwt_forward_batch(data[i : i + 1], lens[i : i + 1]) for i in range(rows)]
    u = jnp.concatenate([p[0] for p in parts], axis=0)
    sync(u)
    mb = tot / (1 << 20)
    te = timeit(f"cm_enc [{rows},{width>>20}Mi]", cm_encode_pallas_batch, u, lens, reps=1)
    print(f"  = {mb/te:.2f} MB/s", flush=True)
    pay, plens = cm_encode_pallas_batch(u, lens)
    pay = pay.astype(jnp.uint8)
    sync(pay, plens)
    td = timeit(
        f"cm_dec [{rows},{width>>20}Mi]",
        lambda p, pl, l: cm_decode_pallas_batch(p, pl, l, width),
        pay, plens, lens, reps=1,
    )
    print(f"  = {mb/td:.2f} MB/s", flush=True)


if __name__ == "__main__":
    sections = sys.argv[1:] or ["prims", "bwt"]
    for s in sections:
        print(f"--- {s} ---", flush=True)
        if s == "prims":
            prims()
        elif s == "bwt":
            bwt_fwd()
        elif s == "inv":
            bwt_inv()
        elif s == "cm8":
            cm(8, N)
        elif s == "cm32":
            cm(32, 4 << 20)
        elif s.startswith("cm:"):
            _, r, w = s.split(":")
            cm(int(r), int(float(w) * (1 << 20)))
