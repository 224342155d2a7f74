#!/usr/bin/env python
"""Frame-level decompress fuzzer (cf. reference examples/fuzz-decompress.c).

Random and mutated BZ3v1 frames must either decode correctly or raise
a clean Bz3Error.

    python examples/fuzz_decompress.py [seed|path] [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bzip3_tpu
from bzip3_tpu.errors import Bz3Error


def try_frame(blob: bytes) -> None:
    try:
        bzip3_tpu.decompress(blob, max_output=1 << 24)
    except Bz3Error:
        pass


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "0"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    if os.path.exists(arg):
        try_frame(open(arg, "rb").read())
        print("ok")
        return

    rng = np.random.default_rng(int(arg))
    valid = bzip3_tpu.compress(
        rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(), 65 * 1024
    )
    for it in range(iters):
        mode = it % 3
        if mode == 0:
            n = int(rng.integers(0, 100))
            blob = b"BZ3v1" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif mode == 1:
            b = bytearray(valid)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
            blob = bytes(b)
        else:
            blob = valid[: int(rng.integers(0, len(valid)))]
        try_frame(blob)
        if (it + 1) % 100 == 0:
            print(f"{it + 1}/{iters} ok", flush=True)
    print("all ok")


if __name__ == "__main__":
    main()
