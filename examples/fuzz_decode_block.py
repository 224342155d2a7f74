#!/usr/bin/env python
"""Adversarial block-decode fuzzer (cf. reference examples/fuzz-decode-block.c).

Feeds attacker-controlled (orig_size, payload) pairs straight into the
block decoder; the contract is: either a clean Bz3Error or a correct
decode — never a crash, hang, or out-of-bounds access.

    python examples/fuzz_decode_block.py [seed|path] [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bzip3_tpu.errors import Bz3Error
from bzip3_tpu.models.block_codec import encode_block, decode_block

BS = 65 * 1024


def try_decode(block: bytes, orig_size: int, engine=None) -> None:
    try:
        decode_block(block, orig_size, BS)
    except Bz3Error:
        pass  # clean rejection is the expected outcome


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "0"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    if os.path.exists(arg):
        raw = open(arg, "rb").read()
        osize = int.from_bytes(raw[:4], "little") % (2 * BS) if len(raw) >= 4 else 0
        try_decode(raw[4:], osize)
        print("ok")
        return

    rng = np.random.default_rng(int(arg))
    seedling = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    valid = encode_block(seedling)
    for it in range(iters):
        mode = it % 3
        if mode == 0:
            # pure garbage
            n = int(rng.integers(0, 200))
            block = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif mode == 1:
            # bit-flipped valid block
            b = bytearray(valid)
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
            block = bytes(b)
        else:
            # truncated / extended valid block
            cut = int(rng.integers(0, len(valid) + 20))
            block = valid[:cut] + bytes(int(rng.integers(0, 16)))
        osize = int(rng.integers(0, 3 * len(seedling)))
        try_decode(block, osize)
        if (it + 1) % 100 == 0:
            print(f"{it + 1}/{iters} ok", flush=True)
    print("all ok")


if __name__ == "__main__":
    main()
