"""Randomized cross-engine differential: device pipeline vs oracle.

Complements differential_vs_reference.py (which pins the NATIVE engine
to the reference binary): this one randomizes the DEVICE pipeline's
XLA paths — device BWT, device RLE, and the exact windowed parallel
CM encoder — against the oracle block codec, on the CPU backend.

Block sizes are drawn from a small fixed set so XLA compiles stay
bounded; data lengths/classes are fully random, including the <64-byte
literal boundary and empty blocks.

Usage: python examples/differential_engines.py [seed] [trials]

Long campaigns should run as FRESH-PROCESS chunks (vary the seed):
XLA:CPU JIT section mappings accumulate per process and a single
process dies with "LLVM ERROR: Unable to allocate section memory"
after ~50 distinct compiled shapes on default vm.max_map_count boxes:

    for i in 0 1 2 3 4; do python examples/differential_engines.py \
        $((200+i)) 30 || exit 1; done
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_data(rng) -> bytes:
    n = int(rng.integers(0, 130000))
    kind = int(rng.integers(0, 7))
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:  # runny
        if n == 0:
            return b""
        raw = rng.integers(0, 256, n, dtype=np.uint8)
        fresh = rng.random(n) < 0.08
        fresh[0] = True
        return raw[np.maximum.accumulate(np.where(fresh, np.arange(n), 0))].tobytes()
    if kind == 2:
        return rng.integers(97, 97 + int(rng.integers(2, 9)), n, dtype=np.uint8).tobytes()
    if kind == 3:
        base = rng.integers(32, 127, int(rng.integers(3, 400)), dtype=np.uint8).tobytes()
        return (base * (n // max(1, len(base)) + 1))[:n]
    if kind == 4:
        return bytes(n)
    if kind == 5:  # literal-path boundary region
        return rng.integers(0, 256, int(rng.integers(0, 130)), dtype=np.uint8).tobytes()
    from bench import make_corpus

    return make_corpus(n, seed=int(rng.integers(1 << 30)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from bzip3_tpu.pipeline import DevicePipeline
    from bzip3_tpu.models.block_codec import encode_block, decode_block

    rng = np.random.default_rng(seed)
    pipes = {bs: DevicePipeline(bs) for bs in (66560, 131072)}
    for t in range(trials):
        bs = 66560 if int(rng.integers(0, 2)) == 0 else 131072
        pipe = pipes[bs]
        k = int(rng.integers(1, 5))
        blocks = [make_data(rng)[:bs] for _ in range(k)]
        enc_dev = pipe.encode_blocks(blocks)
        enc_ref = [encode_block(b) for b in blocks]
        assert enc_dev == enc_ref, f"trial {t}: encode mismatch (bs={bs})"
        dec = pipe.decode_blocks([(e, len(b)) for e, b in zip(enc_dev, blocks)])
        assert dec == blocks, f"trial {t}: decode mismatch (bs={bs})"
        # cross: device decodes oracle streams (same bytes, but keeps the
        # path honest if encoders ever diverge)
        dec2 = [decode_block(e, len(b), bs) for e, b in zip(enc_dev, blocks)]
        assert dec2 == blocks, f"trial {t}: oracle cannot decode device stream"
        if (t + 1) % 10 == 0:
            print(f"{t + 1}/{trials} ok", flush=True)
    print("all ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
