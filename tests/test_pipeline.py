"""Batched device pipeline and sharded (multi-chip) pipeline tests."""

import numpy as np
import pytest

from bzip3_tpu.models.block_codec import encode_block, decode_block
from bzip3_tpu.pipeline import DevicePipeline
from bzip3_tpu.parallel.sharding import make_mesh, sharded_pipeline

BS = 1024
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def blocks(text_data):
    return [
        text_data[:BS],
        bytes(RNG.integers(0, 256, BS, dtype=np.uint8)),
        b"ab" * (BS // 2),
        b"x" * 40,  # literal path (< 64 bytes)
        text_data[BS : 2 * BS],
        b"\x00" * BS,
        bytes(RNG.integers(0, 16, 700, dtype=np.uint8)),
        b"",
    ]


def test_device_pipeline_round_trip(blocks):
    pipe = DevicePipeline(BS)
    encoded = pipe.encode_blocks(blocks)
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    assert decoded == list(blocks)


def test_device_pipeline_matches_oracle_blocks(blocks):
    """Device-encoded blocks decode through the oracle block codec and
    produce identical bytes to oracle encoding (full bit parity)."""
    pipe = DevicePipeline(BS)
    encoded = pipe.encode_blocks(blocks)
    for e, b in zip(encoded, blocks):
        assert decode_block(e, len(b), BS) == b
        assert encode_block(b) == e


def test_oracle_blocks_decode_on_device(blocks):
    pipe = DevicePipeline(BS)
    encoded = [encode_block(b) for b in blocks]
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    assert decoded == list(blocks)


def test_sharded_pipeline_round_trip(blocks):
    mesh = make_mesh(8)
    pipe = sharded_pipeline(BS, mesh)
    encoded = pipe.encode_blocks(blocks)  # len 8 == mesh size
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    assert decoded == list(blocks)


def test_sharded_matches_unsharded(blocks):
    mesh = make_mesh(8)
    assert sharded_pipeline(BS, mesh).encode_blocks(blocks) == DevicePipeline(
        BS
    ).encode_blocks(blocks)


def test_multihost_helpers_single_process():
    """Single-process degradation of the multi-host layer."""
    import numpy as np
    from bzip3_tpu.parallel import multihost as mh

    mh.initialize()  # no-op without coordinator
    mesh = mh.global_mesh()
    assert mesh.devices.size == 8
    assert list(mh.host_stripe(5)) == [0, 1, 2, 3, 4]
    rows = np.arange(16 * 4, dtype=np.int32).reshape(16, 4)
    g = mh.make_global_batch(mesh, rows)
    assert g.shape == (16, 4)
    p, l = mh.gather_to_writer(g, np.arange(16, dtype=np.int32))
    assert (p == rows).all() and (l == np.arange(16)).all()


def test_encode_ok_flag_fallback_reencodes(blocks):
    """Rows the device CM encoder flags as non-exact must be re-encoded
    through the serial path, never emitted (silent-corruption guard for
    the cm_parallel ok contract, ops/device/cm_parallel.py:25-27)."""
    import numpy as np

    pipe = DevicePipeline(BS)
    real_core = pipe.encode_core_fn

    def poisoned_core(orig, orig_lens, cur, cur_lens):
        crc, idx, payload, plens, ok = real_core(orig, orig_lens, cur, cur_lens)
        ok = np.asarray(ok).copy()
        ok[:] = False  # pretend every row failed certification
        return crc, idx, payload, plens, ok

    pipe.encode_core_fn = poisoned_core
    encoded = pipe.encode_blocks(blocks)
    # Every non-literal block must still be byte-identical to the oracle.
    for e, b in zip(encoded, blocks):
        assert e == encode_block(b)
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    assert decoded == list(blocks)


def test_cm_encode_batch_reports_overflow_length():
    """cm_encode_batch must report the TRUE output length even when it
    exceeds the padded width (writes drop, optr keeps counting), so the
    pipeline's ok = plens <= W check can catch the overflow."""
    import jax.numpy as jnp
    from bzip3_tpu.ops.device.cm import cm_encode_batch

    data = np.asarray(RNG.integers(0, 256, (1, 512), dtype=np.uint8))
    out, lens = cm_encode_batch(jnp.asarray(data), jnp.asarray([512], np.int32))
    true_len = int(np.asarray(lens)[0])
    # Re-run with a width too small to hold the payload.
    out2, lens2 = cm_encode_batch(
        jnp.asarray(data), jnp.asarray([512], np.int32), out_width=max(8, true_len // 4)
    )
    assert int(np.asarray(lens2)[0]) == true_len  # length survives the clamp
    assert true_len > max(8, true_len // 4)  # i.e. ok would be False


def test_hybrid_engine_matches_native(blocks):
    """Hybrid (device+native concurrent split) must be byte-identical
    to the native engine and round-trip."""
    from bzip3_tpu.engines import get_engine

    try:
        nat = get_engine("native")
    except Exception:
        pytest.skip("no native toolchain")
    hyb = get_engine("hybrid")
    hyb.device_share = 0.5  # force a real split regardless of env
    enc_h = hyb.encode_blocks(blocks, BS)
    enc_n = nat.encode_blocks(blocks, BS)
    assert enc_h == enc_n
    pairs = [(e, len(b)) for e, b in zip(enc_h, blocks)]
    assert hyb.decode_blocks(pairs, BS) == blocks


def test_device_prepass_full_chain(blocks, monkeypatch):
    """BZ3_TPU_DEVICE_PREPASS=1: all four stage codecs run on device
    (RLE batch kernels + scalar-unit LZP + BWT + CM); streams must stay
    byte-identical to the oracle and round-trip."""
    monkeypatch.setenv("BZ3_TPU_DEVICE_PREPASS", "1")
    pipe = DevicePipeline(BS)
    assert pipe._full_cores()
    encoded = pipe.encode_blocks(blocks)
    for e, b in zip(encoded, blocks):
        assert e == encode_block(b)
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks)])
    assert decoded == list(blocks)


def test_difficulty_ordering_restores_block_order():
    """Waves permute rows by BWT difficulty (pipeline._bwt_difficulty);
    outputs must come back in the caller's order and byte-identical to
    the oracle even when the wave mixes trivial and pathological rows."""
    per = (b"qwertyui" * 1200)[:6000]
    blocks2 = [
        RNG.integers(0, 256, 5000, dtype=np.uint8).tobytes(),  # instant
        per,                                                   # deep doubling
        b"the quick brown fox jumps over the lazy dog. " * 150,
        per[:4500],
        RNG.integers(97, 123, 6500, dtype=np.uint8).tobytes(),
        b"\x00" * 4800,
    ]
    pipe = DevicePipeline(8192)
    diffs = [
        __import__("bzip3_tpu.pipeline", fromlist=["_bwt_difficulty"])._bwt_difficulty(b)
        for b in blocks2
    ]
    assert max(diffs) - min(diffs) > 0.05  # the permutation path engages
    encoded = pipe.encode_blocks(blocks2)
    for e, b in zip(encoded, blocks2):
        assert e == encode_block(b)
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, blocks2)])
    assert decoded == blocks2


def test_split_dispatch_path(blocks, monkeypatch):
    """The split-dispatch regime (per-group BWT programs + a lane-
    filled CM chain, per-group inverse pulls) at tiny shapes: force the
    Pallas CM (interpret mode on CPU), a sub-block split threshold, and
    2-row BWT groups so a 5-block wave runs 3 separate group programs
    and the decode returns a LIST of pulled group slices.  Output must
    stay byte-identical to the oracle block codec."""
    monkeypatch.setenv("BZ3_TPU_CM", "pallas")
    monkeypatch.setenv("BZ3_TPU_SPLIT_DISPATCH_MIB", "0.0005")
    monkeypatch.setenv("BZ3_TPU_BWT_GROUP_ROWS", "2")
    sub = [blocks[0], blocks[1], blocks[2], blocks[4], blocks[6]]
    pipe = DevicePipeline(BS)
    encoded = pipe.encode_blocks(sub)
    for e, b in zip(encoded, sub):
        assert e == encode_block(b)
    decoded = pipe.decode_blocks([(e, len(b)) for e, b in zip(encoded, sub)])
    assert decoded == sub

    # group size that does NOT divide the wave rows: the grouped-H2D
    # encode pads the last group and trims the overhang
    monkeypatch.setenv("BZ3_TPU_BWT_GROUP_ROWS", "3")
    pipe2 = DevicePipeline(BS)
    encoded2 = pipe2.encode_blocks(sub)
    for e, b in zip(encoded2, sub):
        assert e == encode_block(b)


def test_oversize_hostbwt_route(text_data, monkeypatch):
    """Blocks past the device HBM cap route through the HOST-BWT hybrid
    (host SA-IS / quad-merge inverse + device CM, pipeline.py
    _encode_blocks_oversize) and stay byte-identical to the oracle
    block codec.  BZ3_TPU_FORCE_OVERSIZE exercises the route on the
    CPU backend at a tiny cap; on chip the same path serves the format
    range past 128 MiB (src/libbz3.c:536)."""
    monkeypatch.setenv("BZ3_TPU_MAX_DEVICE_BLOCK_MIB", "0.001")
    monkeypatch.setenv("BZ3_TPU_FORCE_OVERSIZE", "1")
    bs = 4096
    pipe = DevicePipeline(bs)
    assert pipe.oversize
    cases = [
        text_data[:bs],
        b"ab" * (bs // 2),
        b"x" * 40,  # literal path
        bytes(RNG.integers(0, 256, bs, dtype=np.uint8)),
        text_data[bs : bs + 3000],
    ]
    enc = pipe.encode_blocks(cases)
    for e, b in zip(enc, cases):
        assert e == encode_block(b)
    dec = pipe.decode_blocks([(e, len(b)) for e, b in zip(enc, cases)])
    assert dec == cases


def test_sharded_dispatch_overhead_regression(blocks):
    """shard_map at n=1 must not cost materially more than the plain
    pipeline (the verdict-8 regression net; the measured overhead on
    the CPU mesh is 1.02x encode / 0.94x decode, scripts/shardcurve.py
    — the bound here is generous because CI boxes are noisy).

    Wall-clock ratio asserts flake under CI load spikes (ADVICE r4),
    so this runs only in the perf lane: BZ3_PERF=1."""
    import os
    import time

    if os.environ.get("BZ3_PERF", "0") != "1":
        pytest.skip("wall-clock perf assert; set BZ3_PERF=1 for the perf lane")

    pipe_u = DevicePipeline(BS)
    pipe_s = sharded_pipeline(BS, make_mesh(1))

    def rt(pipe):
        enc = pipe.encode_blocks(blocks)  # warmup/compile
        pairs = [(e, len(b)) for e, b in zip(enc, blocks)]
        assert pipe.decode_blocks(pairs) == blocks
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pipe.encode_blocks(blocks)
            pipe.decode_blocks(pairs)
            best = min(best, time.perf_counter() - t0)
        return best

    t_u = rt(pipe_u)
    t_s = rt(pipe_s)
    assert t_s < t_u * 2.0, (
        f"sharded n=1 round trip {t_s:.3f}s vs unsharded {t_u:.3f}s — "
        "dispatch overhead regressed far past the measured 1.02x"
    )


def test_sharded_inverse_bwt_scaling_regression(text_data):
    """Sharded decode's SHARDABLE stage must actually scale: the
    inverse BWT at n=4 on the virtual mesh must run well under the
    unsharded wall (measured ~0.5x; bound 0.7x per the round-4
    verdict).  The CM scan's serial step count cannot shard on this
    backend (PERF_NOTES R5.1), so the e2e decode ratio is not a valid
    CPU-mesh signal — this stage ratio is.  BZ3_PERF lane (wall-clock
    assert)."""
    import os
    import time

    if os.environ.get("BZ3_PERF", "0") != "1":
        pytest.skip("wall-clock perf assert; set BZ3_PERF=1 for the perf lane")
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch

    k, n = 8, 256 << 10
    raw = np.frombuffer((text_data * (k * n // len(text_data) + 1))[: k * n],
                        np.uint8).reshape(k, n)
    data = jnp.asarray(raw)
    lens = jnp.full((k,), n, jnp.int32)
    u, idx = bwt_forward_batch(data, lens)
    u.block_until_ready()

    def best_of(fn, reps=3):
        fn(u, lens, idx).block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(u, lens, idx).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t_u = best_of(jax.jit(lambda a, b, c: bwt_inverse_batch(a, b, c)))
    mesh = make_mesh(4)
    t_s = best_of(
        jax.jit(
            shard_map(
                lambda a, b, c: bwt_inverse_batch(a, b, c),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp")),
                out_specs=P("dp"),
                check_vma=False,
            )
        )
    )
    assert t_s < t_u * 0.7, (
        f"sharded inverse-BWT n=4 {t_s:.3f}s vs unsharded {t_u:.3f}s — "
        "the shardable decode stage stopped scaling"
    )
