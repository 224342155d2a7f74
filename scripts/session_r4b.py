"""Round-4 on-chip session B: BWT round-structure A/B, then the REAL
device-engine e2e path at -b 16 with stage profiling.

Usage: python scripts/session_r4b.py [sections ...]   (bwtab, e2e256, e2e512)
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


def bwtab():
    from bzip3_tpu.ops.device import bwt as B
    from bzip3_tpu.ops.ref.bwt import bwt_forward as ref_fwd

    for kdim, n in ((1, 16 << 20), (4, 16 << 20), (16, 1 << 20)):
        mb = kdim * n / (1 << 20)
        for seedmode, stride in (("4", "6"), ("8", "3"), ("8", "4"), ("8", "2")):
            os.environ["BZ3_TPU_BWT_SEED"] = seedmode
            os.environ["BZ3_TPU_BWT_STRIDE_FULL"] = stride
            fwd = jax.jit(B.bwt_forward_batch.__wrapped__)
            data, lens = corpus_rows(kdim, n, 11)
            u, idx = fwd(data, lens); sync(u, idx)
            best = 1e9
            for r in range(2):
                data, lens = corpus_rows(kdim, n, 13 + r)
                sync(data)
                t0 = time.time(); u, idx = fwd(data, lens); sync(u, idx)
                best = min(best, time.time() - t0)
            log(f"bwt fwd seed={seedmode} stride={stride} [{kdim}x{n>>20}Mi]: "
                f"{best:.2f}s ({mb/best:.2f} MB/s)")
            if kdim == 1 and n <= (1 << 20):
                ru, ri = ref_fwd(bytes(np.asarray(data[0])))
                assert bytes(np.asarray(u)[0]) == ru and int(np.asarray(idx)[0]) == ri
    del os.environ["BZ3_TPU_BWT_SEED"]
    del os.environ["BZ3_TPU_BWT_STRIDE_FULL"]


def e2e(mib):
    from bzip3_tpu.engines import get_engine

    os.environ["BZ3_TPU_PROFILE"] = "1"
    dev = get_engine("device")
    bs = 16 << 20
    corpus = make_corpus(mib << 20)
    blocks = [corpus[i : i + bs] for i in range(0, len(corpus), bs)]
    t0 = time.time()
    enc = dev.encode_blocks(blocks, bs)
    log(f"e2e{mib} warm encode (incl compiles): {time.time()-t0:.1f}s")
    pairs = [(e, len(b)) for e, b in zip(enc, blocks)]
    t0 = time.time()
    dec = dev.decode_blocks(pairs, bs)
    assert dec == blocks
    log(f"e2e{mib} warm decode (incl compiles): {time.time()-t0:.1f}s")
    t0 = time.time()
    enc = dev.encode_blocks(blocks, bs)
    te = time.time() - t0
    t0 = time.time()
    dec = dev.decode_blocks(pairs, bs)
    td = time.time() - t0
    assert dec == blocks
    log(f"e2e{mib}: encode {mib/te:.2f} MiB/s  decode {mib/td:.2f} MiB/s  "
        f"RT {mib/(te+td):.2f} MiB/s")
    for pipe in getattr(dev, "_pipes", {}).values():
        print(pipe.timer.summary(), flush=True)


def main():
    secs = sys.argv[1:] or ["bwtab", "e2e256"]
    log(f"backend: {jax.default_backend()} sections: {secs}")
    for s in secs:
        if s == "bwtab":
            bwtab()
        elif s.startswith("e2e"):
            e2e(int(s[3:]))


if __name__ == "__main__":
    main()
