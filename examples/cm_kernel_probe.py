"""On-chip CM Pallas kernel timing probe (decode by default, encode opt-in).

Builds realistic post-BWT data, CM-encodes it with the host oracle, and
times the Pallas decode kernel compiled on the real accelerator.  The
``BZ3_TPU_ABLATE`` env var (read at kernel build time) disables pieces of
the kernel body so their dependency-chain cost can be attributed:

    A  front-end C2/SSE gathers replaced by p0
    B  C2 table writes dropped
    D  per-bit stream prefetch dropped (stale window sums)
    E  C1 row rotation dropped
    F  input-window DMA maintenance dropped

Ablated kernels decode garbage (the coder state diverges) — this probe is
for TIMING attribution only; correctness is asserted only for the
unablated default.  Run one ablation per process: the env var is baked
into the traced kernel.

Usage:  python examples/cm_kernel_probe.py [n_kib_per_lane] [reps]
        BZ3_TPU_ABLATE=A python examples/cm_kernel_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    lanes = int(os.environ.get("PROBE_LANES", "8"))
    n = n_kib * 1024

    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from bzip3_tpu.ops.ref.bwt import bwt_forward
    from bzip3_tpu.ops.ref.cm import cm_encode
    from bzip3_tpu.ops.device.cm_pallas import cm_decode_pallas_batch

    # make_corpus can come up a few bytes short of the request; pad so
    # every lane really holds n bytes (the timing assumes equal lanes).
    corpus = make_corpus(lanes * n, seed=7)
    corpus = corpus + bytes((lanes * n) - len(corpus))
    blocks = []
    for i in range(lanes):
        u, _ = bwt_forward(corpus[i * n : (i + 1) * n])
        blocks.append(u)
    enc = [cm_encode(b) for b in blocks]

    if os.environ.get("PROBE_MODE", "decode") == "encode":
        _encode_probe(jax, jnp, blocks, enc, lanes, n, n_kib, reps)
        return

    m = max(len(e) for e in enc)
    pdata = np.zeros((lanes, m), np.uint8)
    plens = np.zeros((lanes,), np.int32)
    for i, e in enumerate(enc):
        pdata[i, : len(e)] = np.frombuffer(e, np.uint8)
        plens[i] = len(e)
    olens = np.full((lanes,), n, np.int32)

    dev = jax.devices()[0]
    pdata_j = jax.device_put(jnp.asarray(pdata), dev)
    plens_j = jax.device_put(jnp.asarray(plens), dev)
    olens_j = jax.device_put(jnp.asarray(olens), dev)

    t0 = time.time()
    out = cm_decode_pallas_batch(pdata_j, plens_j, olens_j, n, lanes=lanes,
                                 interpret=False)
    _ = int(jnp.sum(out.astype(jnp.int32)))  # tunnel-safe sync
    compile_s = time.time() - t0

    ablate = os.environ.get("BZ3_TPU_ABLATE", "")
    if not ablate:
        got = np.asarray(out)
        for i, b in enumerate(blocks):
            assert got[i].tobytes() == b, f"lane {i} mismatch"

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = cm_decode_pallas_batch(pdata_j, plens_j, olens_j, n,
                                     lanes=lanes, interpret=False)
        _ = int(jnp.sum(out.astype(jnp.int32)))
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({
        "ablate": ablate,
        "lanes": lanes,
        "n_per_lane_kib": n_kib,
        "compile_s": round(compile_s, 1),
        "best_s": round(best, 4),
        "per_step_us": round(best / n * 1e6, 3),
        "MBps": round(lanes * n / best / 1e6, 3),
        "spec_mul": os.environ.get("BZ3_TPU_SPEC_MUL", "1"),
    }))


def _encode_probe(jax, jnp, blocks, enc, lanes, n, n_kib, reps):
    """Time the Pallas ENCODE kernel on chip (PROBE_MODE=encode)."""
    import time as _t

    from bzip3_tpu.ops.device.cm_pallas import cm_encode_pallas_batch

    data = np.zeros((lanes, n), np.uint8)
    ilens = np.zeros((lanes,), np.int32)
    for i, b in enumerate(blocks):
        data[i, : len(b)] = np.frombuffer(b, np.uint8)
        ilens[i] = len(b)

    dev = jax.devices()[0]
    data_j = jax.device_put(jnp.asarray(data), dev)
    ilens_j = jax.device_put(jnp.asarray(ilens), dev)

    t0 = _t.time()
    pay, plens = cm_encode_pallas_batch(data_j, ilens_j, lanes=lanes,
                                        interpret=False)
    _ = int(jnp.sum(plens.astype(jnp.int32)))
    compile_s = _t.time() - t0

    if not os.environ.get("BZ3_TPU_ABLATE", ""):
        got, gl = np.asarray(pay), np.asarray(plens)
        for i, e in enumerate(enc):
            assert gl[i] == len(e) and got[i, : gl[i]].tobytes() == e, (
                f"lane {i} mismatch"
            )

    times = []
    for _ in range(reps):
        t0 = _t.time()
        pay, plens = cm_encode_pallas_batch(data_j, ilens_j, lanes=lanes,
                                            interpret=False)
        _ = int(jnp.sum(plens.astype(jnp.int32)))
        times.append(_t.time() - t0)
    best = min(times)
    print(json.dumps({
        "mode": "encode",
        "ablate": os.environ.get("BZ3_TPU_ABLATE", ""),
        "lanes": lanes,
        "n_per_lane_kib": n_kib,
        "compile_s": round(compile_s, 1),
        "best_s": round(best, 4),
        "per_step_us": round(best / n * 1e6, 3),
        "MBps": round(lanes * n / best / 1e6, 3),
        "spec_mul": os.environ.get("BZ3_TPU_SPEC_MUL", "1"),
    }))


if __name__ == "__main__":
    main()
