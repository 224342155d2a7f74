"""Round-4 on-chip measurement session A (ONE process — compiles are
per-process and multi-minute through the tunnel, so everything batches
here, cheap XLA probes first, Mosaic-heavy CM variants last).

  1. H2D / D2H tunnel bandwidth
  2. lax.sort primitive costs at [1, 16Mi]
  3. BWT forward: seed {4, 8, 2} x [1,16Mi] and [16,1Mi]; inverse
  4. CM enc/dec at L=32, 128 KiB/lane: new kernels vs old ('CW')
  5. CM enc/dec at L=64 (new kernels)

Usage: python scripts/session_r4a.py [sections ...]
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


def corpus_rows(k, n, seed):
    c = make_corpus(int(k * n * 1.3) + (1 << 20), seed=seed)[: k * n]
    rows = np.frombuffer(c, np.uint8).reshape(k, n)
    return jnp.asarray(rows), jnp.full((k,), n, jnp.int32)


def bandwidth():
    dev = jax.devices()[0]
    x = np.zeros(64 << 20, np.uint8)
    t0 = time.time(); a = jax.device_put(x, dev); sync(a[:8])
    log(f"H2D 64 MiB: {64 / (time.time() - t0):.1f} MB/s")
    t0 = time.time(); _ = np.asarray(a)
    log(f"D2H 64 MiB: {64 / (time.time() - t0):.1f} MB/s")
    t0 = time.time(); _ = np.asarray(a[: 8 << 20])
    log(f"D2H 8 MiB: {8 / (time.time() - t0):.1f} MB/s")


def prims():
    n = 16 << 20
    k = jax.random.randint(jax.random.PRNGKey(0), (1, n), 0, n, jnp.int32)
    vs = [k + i for i in range(1, 7)]
    pos = jax.random.randint(jax.random.PRNGKey(2), (1, n), 0, n, jnp.int32)
    for ops in (3, 5, 7):
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=len(a) - 1, is_stable=True))
        args = (k, *vs[: ops - 2], pos)
        out = f(*args); sync(out[0])
        t0 = time.time(); out = f(*(a + 1 for a in args)); sync(out[0])
        log(f"sort {ops}-operand [1,16Mi]: {time.time()-t0:.3f}s")
    g = jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1))
    out = g(k, pos); sync(out)
    t0 = time.time(); out = g(k + 1, pos); sync(out)
    log(f"gather [1,16Mi]: {time.time()-t0:.3f}s")


def bwt(shapes=((1, 16 << 20), (16, 1 << 20))):
    from bzip3_tpu.ops.device import bwt as B

    for kdim, n in shapes:
        mb = kdim * n / (1 << 20)
        for seedmode in ("4", "8", "2"):
            os.environ["BZ3_TPU_BWT_SEED"] = seedmode
            fwd = jax.jit(B.bwt_forward_batch.__wrapped__)
            data, lens = corpus_rows(kdim, n, 11)
            u, idx = fwd(data, lens); sync(u, idx)
            best = 1e9
            for r in range(2):
                data, lens = corpus_rows(kdim, n, 13 + r)
                sync(data)
                t0 = time.time(); u, idx = fwd(data, lens); sync(u, idx)
                best = min(best, time.time() - t0)
            log(f"bwt fwd seed={seedmode} [{kdim}x{n>>20}Mi]: {best:.2f}s ({mb/best:.2f} MB/s)")
        os.environ["BZ3_TPU_BWT_SEED"] = "4"
        inv = jax.jit(B.bwt_inverse_batch.__wrapped__)
        out = inv(u, lens, idx); sync(out)
        data, lens = corpus_rows(kdim, n, 13 + 1)
        fwd = jax.jit(B.bwt_forward_batch.__wrapped__)
        u, idx = fwd(data, lens); sync(u, idx)
        t0 = time.time(); out = inv(u, lens, idx); sync(out)
        log(f"bwt inv [{kdim}x{n>>20}Mi]: {time.time()-t0:.2f}s ({mb/(time.time()-t0):.2f} MB/s)")
        assert np.array_equal(np.asarray(out), np.asarray(data)), "inv mismatch"


def cm(lanes, kib, variants=("",)):
    from bzip3_tpu.ops.device import cm_pallas as cp

    n = kib << 10
    mb = lanes * n / (1 << 20)
    data, lens = corpus_rows(lanes, n, 17)
    for ab in variants:
        os.environ["BZ3_TPU_ABLATE"] = ab
        t0 = time.time()
        pay, plens = cp.cm_encode_pallas_batch(data, lens, lanes=lanes)
        sync(pay, plens)
        log(f"cm enc L={lanes} ab='{ab}' compile+run {time.time()-t0:.0f}s")
        te = 1e9
        for r in range(2):
            d2, l2 = corpus_rows(lanes, n, 19 + r)
            sync(d2)
            t0 = time.time(); p2, pl2 = cp.cm_encode_pallas_batch(d2, l2, lanes=lanes); sync(p2, pl2)
            te = min(te, time.time() - t0)
        log(f"cm enc L={lanes} ab='{ab}' [{kib}KiB/lane]: {mb/te:.2f} MB/s")
        dec_ab = "".join(c for c in ab if c != "W")
        os.environ["BZ3_TPU_ABLATE"] = dec_ab
        payu = pay.astype(jnp.uint8); sync(payu)
        t0 = time.time()
        dec = cp.cm_decode_pallas_batch(payu, plens, lens, n, lanes=lanes)
        sync(dec)
        log(f"cm dec L={lanes} ab='{dec_ab}' compile+run {time.time()-t0:.0f}s")
        if ab == "":
            assert np.array_equal(np.asarray(dec), np.asarray(data)), "cm roundtrip mismatch"
            log("cm roundtrip EXACT on chip")
        td = 1e9
        for r in range(2):
            d2, l2 = corpus_rows(lanes, n, 19 + r)
            p2, pl2 = cp.cm_encode_pallas_batch(d2, l2, lanes=lanes)
            p2u = p2.astype(jnp.uint8); sync(p2u, pl2)
            t0 = time.time(); dd = cp.cm_decode_pallas_batch(p2u, pl2, l2, n, lanes=lanes); sync(dd)
            td = min(td, time.time() - t0)
        log(f"cm dec L={lanes} ab='{dec_ab}' [{kib}KiB/lane]: {mb/td:.2f} MB/s")
    os.environ["BZ3_TPU_ABLATE"] = ""


def main():
    secs = sys.argv[1:] or ["bandwidth", "prims", "bwt", "cm32", "cm64"]
    log(f"backend: {jax.default_backend()} sections: {secs}")
    for s in secs:
        if s == "bandwidth":
            bandwidth()
        elif s == "prims":
            prims()
        elif s == "bwt":
            bwt()
        elif s == "cm32":
            cm(32, 128, variants=("", "CW"))
        elif s == "cm64":
            cm(64, 128, variants=("",))


if __name__ == "__main__":
    main()
