#!/usr/bin/env python
"""Round-trip fuzzer (cf. reference examples/fuzz-round-trip.c).

Feeds random/structured inputs through encode -> decode and aborts on
any mismatch.  Standalone: bounded random iterations with a seed.
With a file argument: treats the file as the input (AFL-style one-shot
so external fuzzers can drive it).

    python examples/fuzz_round_trip.py [seed|path] [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bzip3_tpu.models.block_codec import encode_block, decode_block
from bzip3_tpu.engines import get_engine


def one_input(data: bytes, engine) -> None:
    bs = max(65 * 1024, len(data))
    enc = engine.encode_blocks([data], bs)[0]
    dec = engine.decode_blocks([(enc, len(data))], bs)[0]
    assert dec == data, f"round-trip mismatch on {len(data)} bytes"


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "0"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    engine = get_engine(os.environ.get("FUZZ_ENGINE", "auto"))

    if os.path.exists(arg):
        one_input(open(arg, "rb").read(), engine)
        print("ok")
        return

    rng = np.random.default_rng(int(arg))
    for it in range(iters):
        kind = it % 5
        n = int(rng.integers(0, 5000))
        if kind == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            data = rng.integers(0, 3, n, dtype=np.uint8).tobytes()
        elif kind == 2:
            data = bytes(rng.integers(0, 256, 1, dtype=np.uint8)) * n
        elif kind == 3:
            word = rng.integers(0, 256, 17, dtype=np.uint8).tobytes()
            data = (word * (n // 17 + 1))[:n]
        else:
            # structured: straddle the 63/64-byte literal boundary
            data = rng.integers(0, 256, 63 + (it % 4), dtype=np.uint8).tobytes()
        one_input(data, engine)
        if (it + 1) % 50 == 0:
            print(f"{it + 1}/{iters} ok", flush=True)
    print("all ok")


if __name__ == "__main__":
    main()
