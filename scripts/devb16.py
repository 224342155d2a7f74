"""End-to-end device-engine probe at the -b 16 operating point.

Usage: python scripts/devb16.py [corpus_mib] [block_mib] [reps]
Prints encode/decode/RT MiB/s + the per-stage profile (BZ3_TPU_PROFILE).
"""
import os, sys, time

os.environ.setdefault("BZ3_TPU_PROFILE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus, run_engine  # noqa: E402
from bzip3_tpu.engines import get_engine  # noqa: E402

mib = float(sys.argv[1]) if len(sys.argv) > 1 else 512
bmib = float(sys.argv[2]) if len(sys.argv) > 2 else 16
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

t0 = time.time()
corpus = make_corpus(int(mib * (1 << 20)))
print(f"corpus {len(corpus)/(1<<20):.1f} MiB in {time.time()-t0:.0f}s", flush=True)
dev = get_engine("device")
stats = run_engine(dev, corpus, int(bmib * (1 << 20)), reps=reps)
print(stats, flush=True)
for key, pipe in getattr(dev, "_pipes", {}).items():
    print(f"--- pipe {key} ---")
    print(pipe.timer.summary())
