"""Pallas CM kernel bit-exactness vs the oracle (ops/ref/cm.py).

Runs in interpret mode on the CPU suite backend; the identical kernel
runs compiled on TPU (exercised by bench.py / the device engine).
Sizes are kept small: the interpreted kernel compiles a large body.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bzip3_tpu.ops.ref.cm import cm_encode, cm_decode

RNG = np.random.default_rng(1234)
LANES = 8


@pytest.fixture(scope="module")
def blocks():
    return [
        bytes(RNG.integers(97, 123, 300, dtype=np.uint8)),
        bytes(RNG.integers(0, 256, 513, dtype=np.uint8)),
        b"abcabcabc" * 40,  # run flag exercises the SSE odd contexts
        b"\x00" * 200,
        bytes(RNG.integers(0, 4, 700, dtype=np.uint8)),
        b"",
        b"Q",
        b"\xff" * 130,
    ]


def _pad(blocks, width):
    arr = np.zeros((len(blocks), width), np.uint8)
    lens = np.zeros((len(blocks),), np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return arr, lens


@pytest.mark.parametrize("spec", [False, True])
def test_cm_pallas_encode_bit_exact(blocks, spec):
    from bzip3_tpu.ops.device.cm_pallas import cm_encode_pallas_batch

    n = max(len(b) for b in blocks)
    data, lens = _pad(blocks, max(128, n))
    out, olens = cm_encode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), lanes=LANES, interpret=True, spec=spec
    )
    out, olens = np.asarray(out), np.asarray(olens)
    for i, b in enumerate(blocks):
        assert out[i, : olens[i]].tobytes() == cm_encode(b), f"block {i}"


@pytest.mark.parametrize("spec", [False, True])
def test_cm_pallas_decode_bit_exact(blocks, spec):
    from bzip3_tpu.ops.device.cm_pallas import cm_decode_pallas_batch

    enc = [cm_encode(b) for b in blocks]
    m = max(len(e) for e in enc)
    pdata, plens = _pad(enc, max(128, m))
    n = max(len(b) for b in blocks)
    width = max(128, n)
    _, lens = _pad(blocks, width)
    dec = np.asarray(
        cm_decode_pallas_batch(
            jnp.asarray(pdata),
            jnp.asarray(plens),
            jnp.asarray(lens),
            width,
            lanes=LANES,
            interpret=True,
            spec=spec,
        )
    )
    for i, b in enumerate(blocks):
        assert dec[i, : lens[i]].tobytes() == b, f"block {i}"


def test_cm_pallas_encode_capped_overflow(blocks):
    """Capped output buffers (the oversize-block hybrid sizes encode
    staging under the worst case): a lane whose payload exceeds the
    cap must CLAMP its output DMAs (no out-of-bounds write) while
    reporting its true length so the caller flags the row — and
    sibling lanes that fit must stay byte-exact."""
    from bzip3_tpu.ops.device.cm_pallas import cm_encode_pallas_batch

    rng = np.random.default_rng(5)
    incompressible = bytes(rng.integers(0, 256, 2000, dtype=np.uint8))
    cases = [blocks[0], incompressible, blocks[2]]
    data, lens = _pad(cases, 2048)
    cap = 1024  # < len(cm_encode(incompressible)) >= 2000
    out, olens = cm_encode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), out_width=cap,
        lanes=LANES, interpret=True,
    )
    out, olens = np.asarray(out), np.asarray(olens)
    assert int(olens[1]) > cap  # true length reported -> caller flags
    for i in (0, 2):  # fitting siblings unaffected
        want = cm_encode(cases[i])
        assert len(want) <= cap
        assert out[i, : olens[i]].tobytes() == want, f"block {i}"


def test_cm_pallas_stream_decode_bit_exact(blocks, monkeypatch):
    """CHUNKED-OUTPUT stream decode (the oversize-block hybrid's CM
    half, cm_decode_pallas_stream): per-launch output buffers with
    launch-relative flush offsets must reassemble to the exact oracle
    bytes across several launches."""
    import bzip3_tpu.ops.device.cm_pallas as cmp_

    monkeypatch.setattr(cmp_, "_CM_CHUNK_STEPS", 512)
    enc = [cm_encode(b) for b in blocks]
    m = max(len(e) for e in enc)
    pdata, plens = _pad(enc, max(128, m))
    n = max(len(b) for b in blocks)
    width = max(1024, n)  # 2 launches at the shrunken 512-step chunk
    _, lens = _pad(blocks, width)
    pieces = list(
        cmp_.cm_decode_pallas_stream(
            jnp.asarray(pdata),
            jnp.asarray(plens),
            jnp.asarray(lens),
            width,
            lanes=LANES,
            interpret=True,
        )
    )
    assert len(pieces) >= 2  # the chunking actually engaged
    u = np.concatenate([np.asarray(c) for _s, c in pieces], axis=1)
    for i, b in enumerate(blocks):
        assert u[i, : len(b)].tobytes() == b, f"block {i}"


@pytest.mark.parametrize("spec", [False, True])
def test_cm_pallas_resumable_multilaunch(blocks, spec, monkeypatch):
    """RESUMABLE launches (state spill/reload between kernel calls,
    PERF_NOTES R3.8) must be byte-exact in both directions.  The chunk
    is shrunk so these small blocks split into several launches."""
    import bzip3_tpu.ops.device.cm_pallas as cmp_

    monkeypatch.setattr(cmp_, "_CM_CHUNK_STEPS", 512)
    monkeypatch.setenv("BZ3_TPU_CM_RESUME", "1")
    n = max(len(b) for b in blocks)
    data, lens = _pad(blocks, max(1024, n))
    out, olens = cmp_.cm_encode_pallas_batch(
        jnp.asarray(data), jnp.asarray(lens), lanes=LANES, interpret=True, spec=spec
    )
    out, olens = np.asarray(out), np.asarray(olens)
    for i, b in enumerate(blocks):
        assert out[i, : olens[i]].tobytes() == cm_encode(b), f"block {i}"
    enc = [cm_encode(b) for b in blocks]
    m = max(len(e) for e in enc)
    pdata, plens = _pad(enc, max(1024, m))
    dec = np.asarray(
        cmp_.cm_decode_pallas_batch(
            jnp.asarray(pdata), jnp.asarray(plens), jnp.asarray(lens),
            max(1024, n), lanes=LANES, interpret=True, spec=spec,
        )
    )
    for i, b in enumerate(blocks):
        assert dec[i, : len(b)].tobytes() == b, f"block {i}"
