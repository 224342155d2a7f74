"""On-chip CM kernel sweep: lanes x {decode, encode} x ablations.

Fresh data + dependent scalar pulls (the axon tunnel memoizes
identical-input redispatch, PERF_NOTES R3.0).

Usage: python scripts/cmsweep.py [KiB-per-lane] [lanes ...]
"""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus

KIB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LANES = [int(a) for a in sys.argv[2:]] or [16, 32, 48, 64]
N = KIB << 10


def sync(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))


def fresh(l, seed):
    corpus = make_corpus(int(l * N * 1.3) + (1 << 20), seed=seed)[: l * N]
    rows = np.frombuffer(corpus, np.uint8).reshape(l, N)
    return jnp.asarray(rows), jnp.full((l,), N, jnp.int32)


def run(l, ab=""):
    os.environ["BZ3_TPU_ABLATE"] = ab
    from bzip3_tpu.ops.device import cm_pallas as cp
    import importlib
    importlib.reload(cp)

    data, lens = fresh(l, 17)
    pay, plens = cp.cm_encode_pallas_batch(data, lens, lanes=l)
    sync(pay, plens)
    dec = cp.cm_decode_pallas_batch(pay.astype(jnp.uint8), plens, lens, N, lanes=l)
    sync(dec)
    if not ab:
        assert np.array_equal(np.asarray(dec), np.asarray(data)), f"L={l} mismatch"
    mb = l * N / (1 << 20)
    te_best = td_best = float("inf")
    for rep in range(2):
        data, lens = fresh(l, 23 + rep)
        sync(data)
        t0 = time.time(); pay, plens = cp.cm_encode_pallas_batch(data, lens, lanes=l); sync(pay, plens)
        te_best = min(te_best, time.time() - t0)
        payu = pay.astype(jnp.uint8); sync(payu)
        t0 = time.time(); dec = cp.cm_decode_pallas_batch(payu, plens, lens, N, lanes=l); sync(dec)
        td_best = min(td_best, time.time() - t0)
    print(f"L={l:3d} ab='{ab}' [{KIB}KiB/lane]: enc {mb/te_best:6.2f} MB/s  dec {mb/td_best:6.2f} MB/s", flush=True)


for l in LANES:
    run(l)
if os.environ.get("CMSWEEP_ABLATE", "0") == "1":
    for ab in ["A", "B", "E", "F", "ABEF"]:
        run(32, ab)
