"""Round-4 session C: BWT forward time forensics at [1, 16Mi].

Isolates: H2D, seed ranks alone, + full rounds (compact disabled),
+ compacts (default), output emission — each as its own jitted piece
where possible, plus whole-fwd A/B on env knobs with DISTINCT corpus
seeds per config (rules out tunnel memoization).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus


def sync(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


N = 16 << 20
SEEDBASE = [100]


def rows(seed):
    c = make_corpus(int(N * 1.3) + (1 << 20), seed=seed)[:N]
    return jnp.asarray(np.frombuffer(c, np.uint8)[None, :]), jnp.full((1,), N, jnp.int32)


def timeit_fwd(tag, env):
    from bzip3_tpu.ops.device import bwt as B

    for k, v in env.items():
        os.environ[k] = v
    # pjit keeps a GLOBAL trace cache keyed on the function object, so
    # env-knob changes are invisible to a re-jit without this (measured
    # — see PERF_NOTES R4.5).
    jax.clear_caches()
    fwd = jax.jit(B.bwt_forward_batch.__wrapped__)
    SEEDBASE[0] += 10
    d, l = rows(SEEDBASE[0])
    u, idx = fwd(d, l); sync(u, idx)
    best = 1e9
    for r in range(2):
        d, l = rows(SEEDBASE[0] + 1 + r)
        sync(d)
        t0 = time.time(); u, idx = fwd(d, l); sync(u, idx)
        best = min(best, time.time() - t0)
    log(f"fwd {tag}: {best:.3f}s ({N / (1 << 20) / best:.2f} MB/s)")
    for k in env:
        del os.environ[k]
    return best


def seed_only():
    """Just the seeding ranks (the 2-key sort path), jitted standalone."""
    from bzip3_tpu.ops.device.bwt import _segstart_ranks

    @jax.jit
    def f(data, lengths):
        k_dim, n = data.shape
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (k_dim, n))
        lens = lengths[:, None]

        def sym(off):
            if off == 0:
                v = data.astype(jnp.int32)
            else:
                v = jnp.concatenate(
                    [data[:, off:], jnp.zeros((k_dim, off), data.dtype)], axis=1
                ).astype(jnp.int32)
            return jnp.where(pos + off < lens, v + 1, 0)

        padkey = pos - jnp.int32(n)
        real = pos < lens
        key_a = jnp.where(real, (sym(0) << 9) | sym(1), padkey)
        key_b = jnp.where(real, (sym(2) << 9) | sym(3), padkey)
        return _segstart_ranks((key_a, key_b), pos)

    d, l = rows(777)
    r, u = f(d, l); sync(r, u)
    d, l = rows(778)
    sync(d)
    t0 = time.time(); r, u = f(d, l); sync(r, u)
    log(f"seed ranks alone: {time.time()-t0:.3f}s  unresolved={int(np.asarray(u)[0])} "
        f"(cap N/6 = {N//6})")


def main():
    log(f"backend: {jax.default_backend()}")
    seed_only()
    timeit_fwd("default (seed4 stride6 div6)", {})
    timeit_fwd("compact OFF", {"BZ3_TPU_BWT_COMPACT": "0"})
    timeit_fwd("div3 cap", {"BZ3_TPU_BWT_COMPACT": "3"})
    timeit_fwd("div12 cap", {"BZ3_TPU_BWT_COMPACT": "12"})
    timeit_fwd("seed8 stride3", {"BZ3_TPU_BWT_SEED": "8", "BZ3_TPU_BWT_STRIDE_FULL": "3"})
    timeit_fwd("compact stride2", {"BZ3_TPU_BWT_STRIDE": "2"})
    timeit_fwd("compact stride8", {"BZ3_TPU_BWT_STRIDE": "8"})


if __name__ == "__main__":
    main()
