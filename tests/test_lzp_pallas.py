"""Scalar-unit LZP Pallas kernel vs the oracle (ops/ref/lzp.py).

Interpret mode on the CPU suite backend; the identical kernel runs
compiled on TPU (device engine / bench).  Cases target the encoder's
quirks: heur rejection, word+0..3 match extension, base-254 lengths,
0xF2 escape with/without a live prediction, and the out_cap guard.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bzip3_tpu.ops.ref.lzp import lzp_encode, lzp_decode, MATCH

RNG = np.random.default_rng(42)


def _cases():
    text = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1600]
    long_match = text[:200] + b"X" * 30 + text[:200] + b"Y" * 30 + text[:500]
    big_run = b"A" * 700 + b"B" * 11 + b"A" * 700
    esc = bytes([MATCH]) * 90 + text[:300] + bytes([MATCH, MATCH, 1, 2, MATCH])
    rnd = bytes(RNG.integers(0, 256, 1500, dtype=np.uint8))
    periodic = b"abcdefgh" * 200
    # repeated 4-byte contexts with diverging continuations (heur path)
    heur = b""
    for i in range(40):
        heur += b"CTXT" + bytes([i]) * 9
    small = b"tiny"  # below MIN_MATCH+32: oracle returns None
    vlong = (text * 20)[:12000]  # multi-254 length bytes
    return [
        text, long_match, big_run, esc, rnd, periodic, heur, small, vlong,
        b"", b"Z" * 71, b"Z" * 72,
    ]


@pytest.fixture(scope="module")
def cases():
    return _cases()


def _pad(blocks, width):
    arr = np.zeros((len(blocks), width), np.uint8)
    lens = np.zeros((len(blocks),), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return arr, lens


def test_lzp_pallas_encode_bit_exact(cases):
    from bzip3_tpu.ops.device.lzp_pallas import lzp_encode_pallas_batch

    width = max(len(c) for c in cases)
    data, lens = _pad(cases, width)
    out, olens = lzp_encode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), interpret=True
    )
    out, olens = np.asarray(out), np.asarray(olens)
    for i, c in enumerate(cases):
        want = lzp_encode(c)
        if want is None:
            assert olens[i] == -1, f"case {i}: expected not-applicable"
        else:
            got = out[i, : olens[i]].tobytes()
            assert got == want, (
                f"case {i}: {len(got)} vs {len(want)} bytes"
            )


def test_lzp_pallas_decode_round_trip(cases):
    from bzip3_tpu.ops.device.lzp_pallas import lzp_decode_pallas_batch

    enc = [(c, lzp_encode(c)) for c in cases]
    enc = [(c, e) for c, e in enc if e is not None]
    width = max(len(e) for _, e in enc)
    data, lens = _pad([e for _, e in enc], width)
    max_out = max(len(c) for c, _ in enc) + 64
    out, olens = lzp_decode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), max_out, interpret=True
    )
    out, olens = np.asarray(out), np.asarray(olens)
    for i, (c, e) in enumerate(enc):
        want = lzp_decode(e, max_out)
        assert want == c
        got = out[i, : olens[i]].tobytes()
        assert got == c, f"case {i}: decode mismatch"


def test_lzp_pallas_decode_truncated_token():
    """Truncated match-token streams must report -1 (the oracle's
    None, reference src/libbz3.c:215-219)."""
    from bzip3_tpu.ops.device.lzp_pallas import lzp_decode_pallas_batch

    base = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1600]
    e = lzp_encode(base + base[:300])
    assert e is not None and MATCH in e
    # cut right after the first MATCH token byte
    cut = e[: e.index(bytes([MATCH])) + 1]
    data, lens = _pad([cut], len(cut))
    out, olens = lzp_decode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), 4096, interpret=True
    )
    want = lzp_decode(cut, 4096)
    if want is None:
        assert int(olens[0]) == -1
    else:  # the cut may land on a literal 0xF2 — then both succeed
        assert np.asarray(out)[0, : olens[0]].tobytes() == want
