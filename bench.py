#!/usr/bin/env python
"""Benchmark: BZ3v1 encode+decode round trip (full pipeline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference bzip3 does ~17 MiB/s encode and ~23 MiB/s
decode per x64 thread (reference README.md:113) — a single-thread
encode+decode round trip of 1/(1/17+1/23) = 9.78 MiB/s.  vs_baseline
is the HEADLINE engine's round-trip MiB/s over that number.

The HEADLINE metric is the TPU device engine at the reference's
headline `-b 16` over a lane-filled corpus (BENCH_DEVICE_B16_MIB,
default 512 MiB = 32 blocks); if the device probe is unavailable or
cut by the budget the headline falls back to the native engine (the
metric name says which).  The line always carries both engines:

- device_b16_*: the headline probe (Pallas CM + XLA BWT/CRC + host
  LZP/RLE at 16 MiB blocks).  BENCH_DEVICE_B16=0 skips.
- native_*: the C++ engine pool at BENCH_BLOCK_MIB (default 16) over
  BENCH_MIB (default 128) MiB — eight blocks, so the pthread pool can
  use up to eight cores.  BENCH_NATIVE=0 skips.
- ref_pool_*: the compiled REFERENCE binary's own pthread pool on the
  same corpus/box (pool-vs-pool); vs_ref_pool is the honest ratio for
  the headline engine, native_vs_ref_pool for the native one.
- device_*: a small-block device probe (BENCH_DEVICE_BLOCK_MIB,
  default 1 MiB) plus device_text_* on a corpus with long-range
  repeats (the LZP-firing regime; the plain corpus is
  LZP-adversarial) and sharded_* through shard_map.
  BENCH_DEVICE_SMALL=0 skips these three.

BENCH_ENGINE=native pins the headline to the native engine.
"""

import json
import os
import signal
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


def make_corpus_repeats(size: int, seed: int = 1) -> bytes:
    """enwik-like corpus WITH long-range repeats: zipf text where
    paragraphs repeat 1-3x, so the LZP pre-pass fires (~0.5 ratio).
    The plain make_corpus is LZP-ADVERSARIAL (no >= 40-byte matches),
    which makes it the device engine's worst case — real text is not
    like that, so the bench reports both regimes."""
    rng = np.random.default_rng(seed + 1)
    base = make_corpus(size // 2 + (64 << 10), seed)
    out = []
    total = 0
    i = 0
    while total < size + 4096:
        ln = int(rng.integers(512, 8192))
        if i + ln >= len(base):
            i = 0
        para = base[i : i + ln]
        i += ln
        for _ in range(int(rng.integers(1, 4))):
            out.append(para)
            total += len(para)
    return b"".join(out)[:size]


def _ref_binary() -> str | None:
    """Compile the reference bzip3 (once) for live apples-to-apples
    numbers.  Benchmark tooling only — the reference sources never
    enter this repo."""
    import shutil
    import subprocess

    path = "/tmp/refbuild/bzip3ref"
    if os.path.exists(path):
        return path
    src = "/root/reference"
    if not os.path.exists(os.path.join(src, "src", "libbz3.c")):
        return None
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    os.makedirs("/tmp/refbuild", exist_ok=True)
    cmd = [
        cc, "-O3", "-march=native", "-DVERSION=\"1.5.2\"", "-DPTHREAD",
        f"-I{src}/include", f"{src}/src/libbz3.c", f"{src}/src/main.c",
        "-o", path, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return path
    except Exception:
        return None


def measure_ref_pool(corpus: bytes, block_mib: float, threads: int = 4):
    """Round-trip the corpus through the reference binary's own pthread
    pool (`-b block -j threads`), same corpus and block size as the
    primary engine — the honest pool-vs-pool comparison
    (reference fan-out: src/libbz3.c:845-870)."""
    import subprocess
    import tempfile

    refbin = _ref_binary()
    if refbin is None:
        return None
    with tempfile.TemporaryDirectory() as d:
        raw = os.path.join(d, "c.bin")
        enc = os.path.join(d, "c.bz3")
        dec = os.path.join(d, "c.out")
        with open(raw, "wb") as f:
            f.write(corpus)
        n = len(corpus) / (1 << 20)
        best_e = best_d = float("inf")
        for _ in range(2):
            for p in (enc, dec):
                if os.path.exists(p):
                    os.unlink(p)
            t0 = time.perf_counter()
            subprocess.run(
                [refbin, "-e", "-b", str(int(block_mib)), "-j", str(threads),
                 "-c", raw], stdout=open(enc, "wb"), check=True)
            t1 = time.perf_counter()
            subprocess.run(
                [refbin, "-d", "-j", str(threads), "-c", enc],
                stdout=open(dec, "wb"), check=True)
            t2 = time.perf_counter()
            best_e = min(best_e, t1 - t0)
            best_d = min(best_d, t2 - t1)
        with open(dec, "rb") as f:
            assert f.read() == corpus, "reference round-trip mismatch"
        return {
            "rt_MiBs": round(n / (best_e + best_d), 4),
            "encode_MiBs": round(n / best_e, 4),
            "decode_MiBs": round(n / best_d, 4),
            "threads": threads,
        }


def run_engine(engine, corpus: bytes, block_size: int, reps: int = 1):
    """Round-trip `corpus` through `engine`; returns a metrics dict.

    ``reps`` > 1 reports best-of-N per direction — used for the device
    engine, whose timings through the shared accelerator tunnel swing
    2-3x run to run (host engines on this box swing ~±20%, one rep is
    representative and the corpus is 8x larger)."""
    blocks = [corpus[i : i + block_size] for i in range(0, len(corpus), block_size)]
    pairs = lambda enc: [(e, len(b)) for e, b in zip(enc, blocks)]

    # Warmup (compiles device programs / first-touch native lib).
    enc_w = engine.encode_blocks(blocks, block_size)
    dec_w = engine.decode_blocks(pairs(enc_w), block_size)
    assert dec_w == blocks, "warmup round-trip mismatch"

    enc_s, dec_s = float("inf"), float("inf")
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        encoded = engine.encode_blocks(blocks, block_size)
        t1 = time.perf_counter()
        decoded = engine.decode_blocks(pairs(encoded), block_size)
        t2 = time.perf_counter()
        assert decoded == blocks, "round-trip mismatch"
        enc_s = min(enc_s, t1 - t0)
        dec_s = min(dec_s, t2 - t1)

    n = len(corpus)
    return {
        "rt_MiBs": round((n / (1 << 20)) / (enc_s + dec_s), 4),
        "encode_MiBs": round((n / (1 << 20)) / enc_s, 4),
        "decode_MiBs": round((n / (1 << 20)) / dec_s, 4),
        "ratio": round(sum(len(e) for e in encoded) / n, 4),
        "corpus_MiB": round(n / (1 << 20), 2),
    }


def main():
    size_mib = float(os.environ.get("BENCH_MIB", "128"))
    block_mib = float(os.environ.get("BENCH_BLOCK_MIB", "16"))
    engine_name = os.environ.get("BENCH_ENGINE", "device")
    dev_mib = float(os.environ.get("BENCH_DEVICE_MIB", "32"))
    dev_block_mib = float(os.environ.get("BENCH_DEVICE_BLOCK_MIB", "1"))
    dev_b16_mib = float(os.environ.get("BENCH_DEVICE_B16_MIB", "512"))
    with_device = os.environ.get("BENCH_DEVICE", "1") != "0"
    with_device_b16 = os.environ.get("BENCH_DEVICE_B16", "1") == "1"
    with_device_small = os.environ.get("BENCH_DEVICE_SMALL", "1") == "1"
    with_sharded = os.environ.get("BENCH_SHARDED", "1") == "1"

    from bzip3_tpu.engines import get_engine

    baseline = 1.0 / (1.0 / 17.0 + 1.0 / 23.0)
    result = {}
    device_stats = None
    device_b16_stats = None
    native_stats = None

    emitted = [False]

    def emit(partial=False):
        if emitted[0]:
            return
        emitted[0] = True
        _finalize(
            result, engine_name, native_stats, block_mib, baseline,
            device_stats, device_b16_stats, dev_block_mib, partial,
        )
        print(json.dumps(result), flush=True)

    # Always produce the JSON line, even if the harness times us out
    # mid-device-compile (device kernel compiles through the tunnel are
    # multi-minute and uncacheable): measure the host engine first and
    # emit whatever exists on SIGTERM/SIGALRM.
    def _bail(signum, frame):
        result.setdefault("device_error", f"budget exceeded (signal {signum})")
        emit(partial=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(int(os.environ.get("BENCH_BUDGET_S", "2500")))

    # ---- native engine + live reference pool (fast, always) ---------
    if os.environ.get("BENCH_NATIVE", "1") == "1":
        engine = get_engine("native")
        corpus = make_corpus(int(size_mib * (1 << 20)))
        native_stats = run_engine(
            engine,
            corpus,
            int(block_mib * (1 << 20)),
            reps=int(os.environ.get("BENCH_REPS", "2")),
        )
        # Live pool-vs-pool reference measurement on the same corpus —
        # the honest host comparison (the published 9.78 MiB/s baseline
        # is SINGLE-thread).
        if os.environ.get("BENCH_REF", "1") == "1":
            try:
                ref = measure_ref_pool(corpus, block_mib)
                if ref is not None:
                    result["ref_pool_rt_MiBs"] = ref["rt_MiBs"]
                    result["ref_pool_encode_MiBs"] = ref["encode_MiBs"]
                    result["ref_pool_decode_MiBs"] = ref["decode_MiBs"]
                    result["ref_pool_threads"] = ref["threads"]
            except Exception as exc:
                result["ref_pool_error"] = f"{type(exc).__name__}: {exc}"[:120]
        del corpus

    # ---- device engine: the `-b 16` HEADLINE first -------------------
    if with_device:
        try:
            dev = get_engine("device")
            if with_device_b16:
                # LANE-FILLED `-b 16`: a batch of 16 MiB blocks (the
                # CM kernel lane group fills across the wave) — the
                # honest number for the north-star config, and the
                # headline metric of this bench.
                device_b16_stats = run_engine(
                    dev, make_corpus(int(dev_b16_mib) << 20), 16 << 20,
                    reps=int(os.environ.get("BENCH_DEVICE_B16_REPS", "1")),
                )
            if with_device_small:
                dev_corpus = make_corpus(int(dev_mib * (1 << 20)))
                device_stats = run_engine(
                    dev,
                    dev_corpus,
                    int(dev_block_mib * (1 << 20)),
                    reps=int(os.environ.get("BENCH_DEVICE_REPS", "2")),
                )
                if os.environ.get("BENCH_DEVICE_TEXT", "1") == "1":
                    # Same block size on the repeat-bearing corpus: the
                    # regime where the LZP pre-pass fires and bucketed
                    # widths shrink every downstream stage.
                    dt = run_engine(
                        dev,
                        make_corpus_repeats(int(dev_mib * (1 << 20))),
                        int(dev_block_mib * (1 << 20)),
                        reps=1,
                    )
                    result["device_text_rt_MiBs"] = dt["rt_MiBs"]
                    result["device_text_encode_MiBs"] = dt["encode_MiBs"]
                    result["device_text_decode_MiBs"] = dt["decode_MiBs"]
                    result["device_text_ratio"] = dt["ratio"]
                    result["device_text_vs_baseline"] = round(
                        dt["rt_MiBs"] / baseline, 4
                    )
                if with_sharded:
                    # On a single chip this equals the device engine
                    # modulo shard_map overhead; on a mesh it scales
                    # block-DP.
                    sh = run_engine(
                        get_engine("sharded"),
                        dev_corpus,
                        int(dev_block_mib * (1 << 20)),
                    )
                    result["sharded_rt_MiBs"] = sh["rt_MiBs"]
                    result["sharded_n_devices"] = len(__import__("jax").devices())
        except Exception as exc:  # no accelerator: report, don't die
            result["device_error"] = f"{type(exc).__name__}: {exc}"[:200]

    if os.environ.get("BZ3_TPU_PROFILE", "0") == "1":
        # Per-stage wall times to stderr (stdout stays one JSON line).
        try:
            for pipe in getattr(dev, "_pipes", {}).values():
                print(pipe.timer.summary(), file=sys.stderr)
        except Exception:
            pass

    signal.alarm(0)
    emit()


def _finalize(
    result, engine_name, native_stats, block_mib, baseline,
    device_stats, device_b16_stats, dev_block_mib, partial,
):
    # HEADLINE: the device engine at `-b 16` (the assignment's north
    # star).  Falls back to the native engine (metric name says so)
    # when the device probe is unavailable or was cut by the budget.
    if engine_name != "native" and device_b16_stats is not None:
        primary, metric = device_b16_stats, "bz3v1_roundtrip_b16_device"
    elif engine_name != "native" and device_stats is not None:
        primary = device_stats
        metric = f"bz3v1_roundtrip_b{int(dev_block_mib)}_device"
    elif native_stats is not None:
        primary, metric = native_stats, f"bz3v1_roundtrip_b{int(block_mib)}_native"
    else:
        primary, metric = {
            "rt_MiBs": 0.0, "encode_MiBs": 0.0, "decode_MiBs": 0.0,
            "ratio": 0.0, "corpus_MiB": 0.0,
        }, "bz3v1_roundtrip_none"
    result.update(
        {
            "metric": metric,
            "value": primary["rt_MiBs"],
            "unit": "MiB/s",
            "vs_baseline": round(primary["rt_MiBs"] / baseline, 4),
            "baseline_mode": "published_single_thread_9.78MiBs",
            "encode_MiBs": primary["encode_MiBs"],
            "decode_MiBs": primary["decode_MiBs"],
            "ratio": primary.get("ratio", 0.0),
            "corpus_MiB": primary.get("corpus_MiB", 0.0),
            "engine": metric.rsplit("_", 1)[-1],
        }
    )
    if native_stats is not None:
        result.update(
            {
                "native_rt_MiBs": native_stats["rt_MiBs"],
                "native_encode_MiBs": native_stats["encode_MiBs"],
                "native_decode_MiBs": native_stats["decode_MiBs"],
                "native_ratio": native_stats["ratio"],
                "native_corpus_MiB": native_stats["corpus_MiB"],
                "native_vs_baseline": round(
                    native_stats["rt_MiBs"] / baseline, 4
                ),
            }
        )
        if result.get("ref_pool_rt_MiBs"):
            result["native_vs_ref_pool"] = round(
                native_stats["rt_MiBs"] / result["ref_pool_rt_MiBs"], 4
            )
    if result.get("ref_pool_rt_MiBs"):
        # pool-vs-pool: the headline engine against the reference's own
        # pthread pool, measured live on the same corpus/box.
        result["vs_ref_pool"] = round(
            primary["rt_MiBs"] / result["ref_pool_rt_MiBs"], 4
        )
    if device_stats is not None:
        result.update(
            {
                "device_rt_MiBs": device_stats["rt_MiBs"],
                "device_encode_MiBs": device_stats["encode_MiBs"],
                "device_decode_MiBs": device_stats["decode_MiBs"],
                "device_ratio": device_stats["ratio"],
                "device_block_MiB": dev_block_mib,
                "device_corpus_MiB": device_stats["corpus_MiB"],
                "device_vs_baseline": round(device_stats["rt_MiBs"] / baseline, 4),
            }
        )
    if device_b16_stats is not None:
        result.update(
            {
                "device_b16_rt_MiBs": device_b16_stats["rt_MiBs"],
                "device_b16_encode_MiBs": device_b16_stats["encode_MiBs"],
                "device_b16_decode_MiBs": device_b16_stats["decode_MiBs"],
                "device_b16_ratio": device_b16_stats["ratio"],
                "device_b16_corpus_MiB": device_b16_stats["corpus_MiB"],
                "device_b16_vs_baseline": round(
                    device_b16_stats["rt_MiBs"] / baseline, 4
                ),
            }
        )
    if partial:
        result["partial"] = True


if __name__ == "__main__":
    sys.exit(main())
