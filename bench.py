#!/usr/bin/env python
"""Benchmark: batched BZ3v1 encode+decode round trip on device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference bzip3 does ~17 MiB/s encode and ~23 MiB/s
decode per x64 thread (README.md:113), i.e. a single-thread
encode+decode round trip of 1/(1/17+1/23) = 9.78 MiB/s.  vs_baseline
is our per-chip round-trip MiB/s over that number.

The corpus is deterministic text-like data (enwik-style mix of words,
markup and numbers); blocks run the full device path (CRC32 + BWT +
CM coder) batched as interleaved lanes.  RLE/LZP host pre-passes are
disabled here so the measurement is the device path; they change ratio,
not validity (model bits 0, src/libbz3.c:609-621).
"""

import json
import os
import sys
import time

import numpy as np


def make_corpus(size: int, seed: int = 0) -> bytes:
    """Deterministic enwik-like mix: words, XML-ish markup, numbers."""
    rng = np.random.default_rng(seed)
    words = [
        b"the", b"of", b"and", b"in", b"to", b"a", b"is", b"was", b"for",
        b"article", b"wikipedia", b"category", b"http", b"reference",
        b"[[", b"]]", b"{{", b"}}", b"<text>", b"</text>", b"<page>",
        b"== ", b" ==\n", b"|", b"&quot;", b"1994", b"2003", b"&amp;",
    ]
    probs = rng.dirichlet(np.ones(len(words)) * 0.5)
    idx = rng.choice(len(words), size=size // 4, p=probs)
    parts = []
    total = 0
    for i in idx:
        w = words[i]
        parts.append(w)
        parts.append(b" ")
        total += len(w) + 1
        if total >= size:
            break
    return b"".join(parts)[:size]


def main():
    block_size = 65536
    size_mib = float(os.environ.get("BENCH_MIB", "4"))
    n_bytes = int(size_mib * 1024 * 1024)
    corpus = make_corpus(n_bytes)

    from bzip3_tpu.pipeline import DevicePipeline

    pipe = DevicePipeline(block_size, use_rle=False, use_lzp=False)
    blocks = [corpus[i : i + block_size] for i in range(0, len(corpus), block_size)]

    # Warmup (compile both directions on the real shapes).
    enc_w = pipe.encode_blocks(blocks)
    dec_w = pipe.decode_blocks([(e, len(b)) for e, b in zip(enc_w, blocks)])
    assert dec_w == blocks, "warmup round-trip mismatch"

    t0 = time.perf_counter()
    encoded = pipe.encode_blocks(blocks)
    t1 = time.perf_counter()
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    t2 = time.perf_counter()
    assert decoded == blocks, "round-trip mismatch"

    n = len(corpus)
    enc_s, dec_s = t1 - t0, t2 - t1
    rt_mibs = (n / (1 << 20)) / (enc_s + dec_s)
    comp = sum(len(e) for e in encoded)

    baseline = 1.0 / (1.0 / 17.0 + 1.0 / 23.0)  # single-thread reference
    result = {
        "metric": "bz3v1_roundtrip_64k_blocks",
        "value": round(rt_mibs, 4),
        "unit": "MiB/s",
        "vs_baseline": round(rt_mibs / baseline, 4),
        "encode_MiBs": round((n / (1 << 20)) / enc_s, 4),
        "decode_MiBs": round((n / (1 << 20)) / dec_s, 4),
        "ratio": round(comp / n, 4),
        "corpus_MiB": round(n / (1 << 20), 2),
        "backend": os.environ.get("JAX_PLATFORMS", "default"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
