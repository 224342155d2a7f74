"""Round-5 session A: decode-step cost decomposition for the sublane-
pairing decision (VERDICT r4 item 1).

The pairing idea halves the VECTOR tile count per step (two lanes per
sublane tile) but leaves the PER-LANE scalar loops (C1 rotation, window
maintenance DMA) linear in L unless they are paired too.  Whether the
rebuild can hit ~2x therefore hangs on how the measured per-step wall
t(L) decomposes into

    t(L) = a (fixed) + s * L (per-lane scalar) + v * ceil(L/8) (tiles)

This probe measures decode at L in {8, 16, 32} x ablations
{none, F (no window maintenance), E (no C1 rotation), EF} with the
R4.1 methodology (fresh inputs per rep, dependent scalar pulls, 128
KiB/lane).  E/F break bit-exactness — measurement only.

Usage: python scripts/session_r5a.py [KiB-per-lane]
"""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus

KIB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = KIB << 10


def sync(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))


def fresh(l, seed):
    corpus = make_corpus(int(l * N * 1.3) + (1 << 20), seed=seed)[: l * N]
    rows = np.frombuffer(corpus, np.uint8).reshape(l, N)
    return jnp.asarray(rows), jnp.full((l,), N, jnp.int32)


from bzip3_tpu.ops.device import cm_pallas as cp

# one encode per L to produce decode payloads (and encode datapoints)
PAY = {}
for l in (8, 16, 32):
    data, lens = fresh(l, 17)
    pay, plens = cp.cm_encode_pallas_batch(data, lens, lanes=l)
    sync(pay, plens)
    mb = l * N / (1 << 20)
    te = float("inf")
    for rep in range(2):
        d2, l2 = fresh(l, 23 + rep)
        sync(d2)
        t0 = time.time(); p2, pl2 = cp.cm_encode_pallas_batch(d2, l2, lanes=l); sync(p2, pl2)
        te = min(te, time.time() - t0)
    print(f"enc L={l:3d}: {mb/te:6.2f} MB/s ({te/(l*N)*1e6:.3f} us/byte-step/{l} lanes -> {te*1e6/N:.3f} us/step)", flush=True)
    PAY[l] = (data, lens)

for ab in ("", "F", "E", "EF"):
    os.environ["BZ3_TPU_ABLATE"] = ab
    for l in (8, 16, 32):
        data, lens = PAY[l]
        mb = l * N / (1 << 20)
        td = float("inf")
        for rep in range(2):
            d2, l2 = fresh(l, 29 + rep)
            p2, pl2 = cp.cm_encode_pallas_batch(d2, l2, lanes=l)
            p2u = p2.astype(jnp.uint8); sync(p2u, pl2)
            t0 = time.time()
            dec = cp.cm_decode_pallas_batch(p2u, pl2, l2, N, lanes=l)
            sync(dec)
            td = min(td, time.time() - t0)
            if not ab and rep == 0:
                assert np.array_equal(np.asarray(dec), np.asarray(d2)), f"L={l}"
        print(f"dec L={l:3d} ab='{ab:2s}': {mb/td:6.2f} MB/s  ({td*1e6/N:.3f} us/step)", flush=True)
