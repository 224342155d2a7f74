"""Sharded-pipeline scaling curve on the virtual CPU mesh.

Measures the WALL-CLOCK RATIO of the sharded device cores at
n ∈ {1, 2, 4, 8} virtual devices against the unsharded pipeline on the
same backend, with a fixed total batch — the dispatch/collective
overhead curve of parallel/sharding.py (absolute rates on the CPU
backend are meaningless; the ratios are the signal).  The reference's
analogue is its pthread fan-out scaling (src/libbz3.c:845-870).

Usage: python scripts/shardcurve.py [blocks] [block_KiB]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_corpus
from bzip3_tpu.pipeline import DevicePipeline
from bzip3_tpu.parallel.sharding import make_mesh, sharded_pipeline

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BS = (int(sys.argv[2]) if len(sys.argv) > 2 else 128) << 10


def rt(pipe, blocks, reps=2):
    enc = pipe.encode_blocks(blocks)  # warmup/compile
    pairs = [(e, len(b)) for e, b in zip(enc, blocks)]
    assert pipe.decode_blocks(pairs) == blocks
    best_e = best_d = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        enc = pipe.encode_blocks(blocks)
        t1 = time.perf_counter()
        pipe.decode_blocks(pairs)
        t2 = time.perf_counter()
        best_e = min(best_e, t1 - t0)
        best_d = min(best_d, t2 - t1)
    return best_e, best_d


def inv_curve():
    """Inverse-BWT stage scaling (the decode stage whose WORK shards;
    the scan-CM's serial step count does not — see PERF_NOTES R5.1)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch

    corpus = make_corpus(K * BS + (1 << 20))[: K * BS]
    rows = np.frombuffer(corpus[: K * BS], np.uint8).reshape(K, BS)
    data = jnp.asarray(rows)
    lens = jnp.full((K,), BS, jnp.int32)
    u, idx = bwt_forward_batch(data, lens)
    u.block_until_ready()

    def run(fn):
        fn(u, lens, idx)[0].block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(u, lens, idx).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    base = run(jax.jit(lambda a, b, c: bwt_inverse_batch(a, b, c)))
    print(f"unsharded inverse-BWT: {base:.3f}s", flush=True)
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        f = jax.jit(
            shard_map(
                lambda a, b, c: bwt_inverse_batch(a, b, c),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp")),
                out_specs=P("dp"),
                check_vma=False,
            )
        )
        tbest = run(f)
        print(f"sharded inverse-BWT n={n}: {tbest:.3f}s ({tbest / base:.2f}x)",
              flush=True)


def main():
    corpus = make_corpus(K * BS + (1 << 20))[: K * BS]
    blocks = [corpus[i : i + BS] for i in range(0, len(corpus), BS)]
    base_e, base_d = rt(DevicePipeline(BS), blocks)
    print(f"unsharded: encode {base_e:.3f}s decode {base_d:.3f}s "
          f"({K} x {BS >> 10} KiB blocks, cpu backend)", flush=True)
    for n in (1, 2, 4, 8):
        pipe = sharded_pipeline(BS, make_mesh(n))
        e, d = rt(pipe, blocks)
        print(
            f"sharded n={n}: encode {e:.3f}s ({e / base_e:.2f}x) "
            f"decode {d:.3f}s ({d / base_d:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    if "inv" in sys.argv:
        inv_curve()
    else:
        main()
