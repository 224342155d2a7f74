"""One-config BWT forward timing at [1, 16Mi] (fresh process per
config — the env knobs bind at trace time).  Prints one line:
  <tag> fwd_ms=<t> MBs=<rate>
Usage: BZ3_TPU_BWT_*=... python scripts/bwtsweep.py <tag> [width_mib]
"""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from b16probe import corpus_exact, sync  # noqa: E402
from bzip3_tpu.ops.device.bwt import bwt_forward_batch  # noqa: E402
from bzip3_tpu.ops.ref.bwt import bwt_forward as ref_bwt  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "cfg"
N = int(float(sys.argv[2]) * (1 << 20)) if len(sys.argv) > 2 else (16 << 20)
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1

best = float("inf")
for rep in range(3):
    corpus = corpus_exact(K * N, 7 + rep)
    data = jnp.asarray(np.frombuffer(corpus, np.uint8).reshape(K, N))
    lens = jnp.full((K,), N, jnp.int32)
    if rep == 0:
        u, idx = bwt_forward_batch(data, lens)
        sync(u, idx)  # compile
        # exactness spot check on a small prefix
        small = corpus[: 1 << 16]
        su, si = bwt_forward_batch(
            jnp.asarray(np.frombuffer(small, np.uint8).reshape(1, -1)),
            jnp.full((1,), len(small), jnp.int32),
        )
        ru, ri = ref_bwt(small)
        assert bytes(np.asarray(su)[0]) == ru and int(si[0]) == ri, "MISMATCH"
    t0 = time.time()
    u, idx = bwt_forward_batch(data, lens)
    sync(u, idx)
    best = min(best, time.time() - t0)
print(f"{tag} fwd_ms={best*1000:.0f} MBs={K*N/(1<<20)/best:.2f}", flush=True)
