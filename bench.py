#!/usr/bin/env python
"""Benchmark: BZ3v1 encode+decode round trip (full pipeline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference bzip3 does ~17 MiB/s encode and ~23 MiB/s
decode per x64 thread (reference README.md:113) — a single-thread
encode+decode round trip of 1/(1/17+1/23) = 9.78 MiB/s.  vs_baseline
is our round-trip MiB/s over that number.

Engine selection (env BENCH_ENGINE):
  native  — C++ host runtime, pthread block fan-out (default; the
            byte-serial CM/LZP stages are host-native by design)
  device  — JAX/XLA batched pipeline on the default backend (TPU)
  sharded — device pipeline shard_map'd over all chips

Corpus: deterministic enwik-style text (words + markup + numbers with
moderate redundancy), env BENCH_MIB sets the size (default 64),
BENCH_BLOCK_MIB the block size (default 16, i.e. the reference's
`-b 16` headline config).
"""

import json
import os
import sys
import time

import numpy as np


def make_corpus(size: int, seed: int = 0) -> bytes:
    """Deterministic text-like data with enwik-ish compressibility."""
    rng = np.random.default_rng(seed)
    vocab = []
    # synthetic vocabulary with zipf-ish frequencies
    letters = np.array(list(b"abcdefghijklmnopqrstuvwxyz"), dtype=np.uint8)
    for i in range(4096):
        ln = int(rng.integers(2, 11))
        vocab.append(bytes(rng.choice(letters, ln)))
    ranks = np.arange(1, len(vocab) + 1)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    markup = [b"<page>", b"</page>", b"[[", b"]]", b"{{", b"}}", b"==", b"&quot;"]
    parts = []
    total = 0
    idx = rng.choice(len(vocab), size=size // 5, p=probs)
    punct = rng.integers(0, 100, size=size // 5)
    for w, pn in zip(idx, punct):
        parts.append(vocab[w])
        if pn < 3:
            parts.append(markup[pn % len(markup)])
        elif pn < 6:
            parts.append(b". ")
        elif pn < 8:
            parts.append(str(int(pn) * 251).encode())
            parts.append(b" ")
        else:
            parts.append(b" ")
        total += 8
        if total >= size + 4096:
            break
    return b"".join(parts)[:size]


def main():
    size_mib = float(os.environ.get("BENCH_MIB", "64"))
    block_mib = float(os.environ.get("BENCH_BLOCK_MIB", "16"))
    engine_name = os.environ.get("BENCH_ENGINE", "native")
    block_size = int(block_mib * (1 << 20))
    n_bytes = int(size_mib * (1 << 20))

    corpus = make_corpus(n_bytes)
    from bzip3_tpu.engines import get_engine

    engine = get_engine(engine_name)
    blocks = [corpus[i : i + block_size] for i in range(0, len(corpus), block_size)]
    pairs = lambda enc: [(e, len(b)) for e, b in zip(enc, blocks)]

    # Warmup (compiles device programs / first-touch native lib).
    enc_w = engine.encode_blocks(blocks, block_size)
    dec_w = engine.decode_blocks(pairs(enc_w), block_size)
    assert dec_w == blocks, "warmup round-trip mismatch"

    t0 = time.perf_counter()
    encoded = engine.encode_blocks(blocks, block_size)
    t1 = time.perf_counter()
    decoded = engine.decode_blocks(pairs(encoded), block_size)
    t2 = time.perf_counter()
    assert decoded == blocks, "round-trip mismatch"

    n = len(corpus)
    enc_s, dec_s = t1 - t0, t2 - t1
    rt_mibs = (n / (1 << 20)) / (enc_s + dec_s)
    comp = sum(len(e) for e in encoded)

    baseline = 1.0 / (1.0 / 17.0 + 1.0 / 23.0)
    result = {
        "metric": f"bz3v1_roundtrip_b{int(block_mib)}_{engine.name}",
        "value": round(rt_mibs, 4),
        "unit": "MiB/s",
        "vs_baseline": round(rt_mibs / baseline, 4),
        "encode_MiBs": round((n / (1 << 20)) / enc_s, 4),
        "decode_MiBs": round((n / (1 << 20)) / dec_s, 4),
        "ratio": round(comp / n, 4),
        "corpus_MiB": round(n / (1 << 20), 2),
        "engine": engine.name,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
