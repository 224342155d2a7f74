#!/usr/bin/env python
"""High-level frame API example (cf. reference examples/hl-api.c:8-43):
compress a file in memory, decompress it, verify the bytes match."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bzip3_tpu


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
    data = open(path, "rb").read()

    compressed = bzip3_tpu.compress(data, block_size=1024 * 1024)
    print(f"{path}: {len(data)} -> {len(compressed)} bytes "
          f"({100.0 * len(compressed) / max(1, len(data)):.2f}%)")

    restored = bzip3_tpu.decompress(compressed)
    assert restored == data, "round trip failed!"
    print("round trip OK")


if __name__ == "__main__":
    main()
