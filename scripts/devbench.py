#!/usr/bin/env python
"""Quick device-engine probe on the real chip (round-3 working tool).

Usage: python scripts/devbench.py [corpus_mib] [block_mib] [reps]
Env: BZ3_TPU_PROFILE=1 for the per-stage summary.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_corpus  # noqa: E402


def main():
    corpus_mib = float(sys.argv[1]) if len(sys.argv) > 1 else 16
    block_mib = float(sys.argv[2]) if len(sys.argv) > 2 else 1
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from bzip3_tpu.engines import get_engine

    eng = get_engine(os.environ.get("DEVBENCH_ENGINE", "device"))
    corpus = make_corpus(int(corpus_mib * (1 << 20)))
    bs = int(block_mib * (1 << 20))
    blocks = [corpus[i : i + bs] for i in range(0, len(corpus), bs)]
    pairs = lambda enc: [(e, len(b)) for e, b in zip(enc, blocks)]

    t0 = time.perf_counter()
    enc = eng.encode_blocks(blocks, bs)
    t1 = time.perf_counter()
    dec = eng.decode_blocks(pairs(enc), bs)
    t2 = time.perf_counter()
    assert dec == blocks
    print(f"warmup(+compile): encode {t1-t0:.1f}s decode {t2-t1:.1f}s")

    n = len(corpus) / (1 << 20)
    best_e, best_d = float("inf"), float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        enc = eng.encode_blocks(blocks, bs)
        t1 = time.perf_counter()
        dec = eng.decode_blocks(pairs(enc), bs)
        t2 = time.perf_counter()
        assert dec == blocks
        e, d = t1 - t0, t2 - t1
        print(
            f"rep{r}: encode {n/e:.2f} MiB/s ({e:.2f}s)  "
            f"decode {n/d:.2f} MiB/s ({d:.2f}s)  rt {n/(e+d):.2f}"
        )
        best_e, best_d = min(best_e, e), min(best_d, d)
    print(
        f"BEST: encode {n/best_e:.2f} decode {n/best_d:.2f} "
        f"rt {n/(best_e+best_d):.2f} MiB/s  ratio {sum(map(len,enc))/len(corpus):.4f}"
    )
    try:
        pipe = eng._pipes[bs]
        if pipe.timer.enabled:
            print(pipe.timer.summary())
    except Exception:
        pass


if __name__ == "__main__":
    main()
