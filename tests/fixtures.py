"""Deterministic fixture inputs.

The raw inputs are regenerated from seeded PRNGs; only the reference
bzip3-produced .bz3 goldens are stored in tests/data (they were created
once with the reference binary, block size 1 MiB: ``bzip3 -e -b 1``).
"""

import random


def sample_text() -> bytes:
    rng = random.Random(1234)
    words = [
        b"lorem",
        b"ipsum",
        b"dolor",
        b"sit",
        b"amet",
        b"consectetur",
        b"adipiscing",
        b"elit",
        b"\xf2byte",
        b"runs:",
        b"aaaaaaaaaaaaaaaa",
    ]
    return b" ".join(rng.choices(words, k=25000))


def sample_mixed() -> bytes:
    rng = random.Random(99)
    text = sample_text()
    return (
        rng.randbytes(30000)
        + b"\x00" * 400000
        + text * 4
        + rng.randbytes(5000)
        + b"ABCD" * 100000
    )
