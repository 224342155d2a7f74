"""On-chip kernel lane (BZ3_TPU_ON_CHIP=1): Mosaic-compiled parity on
the REAL TPU for every Pallas kernel plus one end-to-end round trip.

Interpret mode (the rest of the suite) provably does not model Mosaic
lowering, DMA drain semantics, or the kernel-duration watchdog — the
round-3 resumable-CM DMA crash was invisible to interpret mode
(PERF_NOTES R3.10).  This lane is the regression net for those.
Reference anchor: the reference tests every platform it ships on via
its QEMU CI matrix (.github/workflows/build.yml:64-139).

Run: BZ3_TPU_ON_CHIP=1 python -m pytest tests/test_on_chip.py -v
(or `make test-chip`).  Shapes are kept small — each distinct kernel
shape is a multi-minute Mosaic compile through the tunnel.
"""

import os

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("BZ3_TPU_ON_CHIP", "0") != "1"
    or jax.default_backend() != "tpu",
    reason="needs BZ3_TPU_ON_CHIP=1 and a real TPU backend",
)

RNG = np.random.default_rng(42)
N = 2048  # bytes per block — small keeps Mosaic compiles bounded


def _textish(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"entropy", b"of", b"suffix", b"arrays",
             b"rotations", b"bwt", b"context", b"mixing"]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(0, len(words)))] + b" "
    return bytes(out[:n])


@pytest.fixture(scope="module")
def rows():
    import jax.numpy as jnp

    blocks = [
        _textish(N, 1),
        RNG.integers(0, 256, N, dtype=np.uint8).tobytes(),
        (b"abcdef" * 400)[:N],
        _textish(N, 2),
    ]
    arr = np.zeros((4, N), np.uint8)
    for i, b in enumerate(blocks):
        arr[i] = np.frombuffer(b, np.uint8)
    return blocks, jnp.asarray(arr), jnp.full((4,), N, jnp.int32)


def test_bwt_forward_inverse_on_chip(rows):
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch
    from bzip3_tpu.ops.ref.bwt import bwt_forward as ref_fwd

    blocks, arr, lens = rows
    u, idx = bwt_forward_batch(arr, lens)
    u_np, idx_np = np.asarray(u), np.asarray(idx)
    for i, b in enumerate(blocks):
        ru, ri = ref_fwd(b)
        assert bytes(u_np[i]) == ru and int(idx_np[i]) == ri
    back = np.asarray(bwt_inverse_batch(u, lens, idx))
    for i, b in enumerate(blocks):
        assert bytes(back[i]) == b


def test_cm_encode_decode_on_chip(rows):
    import jax.numpy as jnp
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch
    from bzip3_tpu.ops.device.cm_pallas import (
        cm_encode_pallas_batch,
        cm_decode_pallas_batch,
    )
    from bzip3_tpu.ops.ref.cm import cm_encode, cm_decode

    blocks, arr, lens = rows
    u, _ = bwt_forward_batch(arr, lens)  # production-like input
    pay, plens = cm_encode_pallas_batch(u, lens)
    pay_np, plens_np = np.asarray(pay), np.asarray(plens)
    u_np = np.asarray(u)
    for i in range(len(blocks)):
        ref = cm_encode(bytes(u_np[i]))
        assert bytes(pay_np[i][: plens_np[i]]) == ref
    dec = np.asarray(
        cm_decode_pallas_batch(pay.astype(jnp.uint8), plens, lens, N)
    )
    for i in range(len(blocks)):
        assert bytes(dec[i][:N]) == bytes(u_np[i])
        # and the oracle decodes our stream
        assert cm_decode(bytes(pay_np[i][: plens_np[i]]), N) == bytes(u_np[i])


def test_cm_resumable_split_matches_single_on_chip(rows, monkeypatch):
    """Two-launch resumable chain must be byte-identical to the single
    launch — the state spill/reload and the mid-chain DMA drain are the
    exact code paths that crashed the worker before the R3.10 fix."""
    import jax.numpy as jnp
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch
    from bzip3_tpu.ops.device import cm_pallas

    blocks, arr, lens = rows
    u, _ = bwt_forward_batch(arr, lens)
    pay1, plens1 = cm_pallas.cm_encode_pallas_batch(u, lens)
    monkeypatch.setenv("BZ3_TPU_CM_RESUME", "1")
    monkeypatch.setattr(cm_pallas, "_CM_CHUNK_STEPS", N // 2)
    pay2, plens2 = cm_pallas.cm_encode_pallas_batch(u, lens)
    assert np.array_equal(np.asarray(plens1), np.asarray(plens2))
    p1, p2 = np.asarray(pay1), np.asarray(pay2)
    for i, ln in enumerate(np.asarray(plens1)):
        assert bytes(p1[i][:ln]) == bytes(p2[i][:ln])
    dec = np.asarray(
        cm_pallas.cm_decode_pallas_batch(
            pay2.astype(jnp.uint8), plens2, lens, N
        )
    )
    u_np = np.asarray(u)
    for i in range(len(blocks)):
        assert bytes(dec[i][:N]) == bytes(u_np[i])


def test_lzp_pallas_on_chip():
    import jax.numpy as jnp
    from bzip3_tpu.ops.device.lzp_pallas import (
        lzp_encode_pallas_batch,
        lzp_decode_pallas_batch,
    )
    from bzip3_tpu.ops.ref.lzp import lzp_encode as ref_enc

    data = (_textish(N // 2, 3) * 2)[:N]  # long repeats: LZP fires
    arr = jnp.asarray(np.frombuffer(data, np.uint8)[None, :])
    lens = jnp.full((1,), N, jnp.int32)
    out, olens = lzp_encode_pallas_batch(arr, lens)
    ref = ref_enc(data)
    ol = int(np.asarray(olens)[0])
    if ref is None:
        assert ol < 0 or ol >= N
    else:
        assert bytes(np.asarray(out)[0][:ol]) == ref
        enc = jnp.asarray(np.frombuffer(ref, np.uint8)[None, :])
        dec, dlens = lzp_decode_pallas_batch(
            enc, jnp.full((1,), len(ref), jnp.int32), N
        )
        assert int(np.asarray(dlens)[0]) == N
        assert bytes(np.asarray(dec)[0][:N]) == data


def test_crc32_pallas_on_chip(rows):
    from bzip3_tpu.ops.device.crc32_pallas import crc32_batch_pallas
    from bzip3_tpu.ops.ref.crc32 import crc32 as ref_crc

    blocks, arr, lens = rows
    out = np.asarray(crc32_batch_pallas(arr, lens))
    for i, b in enumerate(blocks):
        assert int(out[i]) & 0xFFFFFFFF == ref_crc(b)


def test_device_engine_e2e_on_chip():
    """One end-to-end round trip through the real device engine, with
    byte parity against the oracle block codec on a small prefix."""
    from bzip3_tpu.engines import get_engine
    from bzip3_tpu.models.block_codec import encode_block

    bs = 64 << 10
    corpus = (
        _textish(96 << 10, 9)
        + RNG.integers(0, 256, 48 << 10, dtype=np.uint8).tobytes()
        + (b"lorem ipsum " * 6000)[: 48 << 10]
    )
    blocks = [corpus[i : i + bs] for i in range(0, len(corpus), bs)]
    dev = get_engine("device")
    enc = dev.encode_blocks(blocks, bs)
    assert enc[0] == encode_block(blocks[0])
    dec = dev.decode_blocks([(e, len(b)) for e, b in zip(enc, blocks)], bs)
    assert dec == blocks


def test_device_16mib_block_e2e_on_chip():
    """One 16 MiB block (the bench's -b 16 shape) through the device
    engine at DEFAULT knobs in the non-heavy on-chip lane — catches
    bench-shape regressions (the R4.8 HBM-blowup class) in pytest
    instead of in the driver's bench run (r4 verdict item 8)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus
    from bzip3_tpu.engines import get_engine

    bs = 16 << 20
    block = make_corpus(int(bs * 1.3) + (1 << 20))[:bs]
    dev = get_engine("device")
    enc = dev.encode_blocks([block], bs)
    dec = dev.decode_blocks([(enc[0], bs)], bs)
    assert dec[0] == block


@pytest.mark.skipif(
    os.environ.get("BZ3_TPU_ON_CHIP_HEAVY", "0") != "1",
    reason="multi-minute heavy lane: BZ3_TPU_ON_CHIP_HEAVY=1",
)
def test_device_128mib_block_on_chip():
    """A FULL 128 MiB block through the device engine on the real chip
    — the HBM-tiled regime (stride-4 wide BWT rounds + 8-launch
    resumable CM).  Proves the device engine covers 2x the old 64 MiB
    ceiling without the native fallback (reference block range
    src/libbz3.c:536)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus
    from bzip3_tpu.engines import get_engine

    bs = 128 << 20
    block = make_corpus(bs + (1 << 20))[:bs]
    dev = get_engine("device")
    enc = dev.encode_blocks([block], bs)
    dec = dev.decode_blocks([(enc[0], bs)], bs)
    assert dec[0] == block


@pytest.mark.skipif(
    os.environ.get("BZ3_TPU_ON_CHIP_HEAVY", "0") != "1",
    reason="multi-minute heavy lane: BZ3_TPU_ON_CHIP_HEAVY=1",
)
@pytest.mark.parametrize("mib", [256, 511])
def test_device_oversize_block_on_chip(mib):
    """256 MiB and the format-max 511 MiB blocks (src/libbz3.c:536)
    through --engine device: the HOST-BWT hybrid (native SA-IS +
    capped/chunked device CM, pipeline.py _encode_blocks_oversize).
    Parity: the stream must decode through the native codec too."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus
    from bzip3_tpu.engines import get_engine

    bs = mib << 20
    block = make_corpus(bs + (1 << 20))[:bs]
    dev = get_engine("device")
    enc = dev.encode_blocks([block], bs)
    from bzip3_tpu.ops.native import NativeCodec

    assert NativeCodec(bs).decode_block(enc[0], bs) == block
    dec = dev.decode_blocks([(enc[0], bs)], bs)
    assert dec[0] == block
