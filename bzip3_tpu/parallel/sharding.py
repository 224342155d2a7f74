"""Multi-chip block parallelism.

The reference's only parallelism is one pthread per block
(bz3_encode_blocks / bz3_decode_blocks, src/libbz3.c:845-870).  The
TPU-native equivalent shards the block-batch axis of the fixed-shape
pipeline over a device mesh: every stage kernel is per-block
independent, so ``shard_map`` over a 1-D ``dp`` mesh runs K/n blocks
per chip with zero cross-chip traffic inside the stages; the only
collective is a ``psum`` of per-chip compressed byte counts (the
frame writer's bookkeeping), which rides ICI.

Multi-host layout (pod slices): each host feeds its local shard of the
block batch, the frame writer host reassembles ordered
(lengths, padded payloads) — the all-gather of variable-length
bitstreams is a gather of fixed ``bound()``-padded rows plus a length
vector, per SURVEY.md §5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.device import crc32_batch_auto as crc32_batch
from ..ops.device.bwt import bwt_forward_batch, bwt_inverse_batch
from ..ops.device.cm import cm_encode_batch, cm_decode_batch


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D block-data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("dp",))


def sharded_encode_core(mesh: Mesh):
    """shard_map'd encode stages; batch axis K must divide the mesh."""

    def _core(orig, orig_lens, cur, cur_lens):
        from ..pipeline import _CM_PARALLEL_MAX_N, _cm_impl
        from ..ops.device.cm_parallel import cm_encode_parallel_batch

        crc = crc32_batch(orig, orig_lens)
        u, idx = bwt_forward_batch(cur, cur_lens)
        if _cm_impl() == "pallas":
            from ..ops.device.cm_pallas import cm_encode_pallas_batch

            payload, plens = cm_encode_pallas_batch(u, cur_lens)
            ok = plens <= payload.shape[1]
        elif cur.shape[1] <= _CM_PARALLEL_MAX_N:
            payload, plens, ok = cm_encode_parallel_batch(u, cur_lens)
        else:
            payload, plens = cm_encode_batch(u, cur_lens)
            ok = plens <= payload.shape[1]
        # Frame bookkeeping: total compressed bytes across all chips.
        total = jax.lax.psum(jnp.sum(plens), "dp")
        return crc, idx, payload, plens, ok, total

    mapped = shard_map(
        _core,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_encode_core_hostcrc(mesh: Mesh):
    """shard_map'd BWT→CM core for the host-CRC fast path: the wave
    scheduler computes CRC32 on the host during the overlapped
    pre-pass, so raw blocks never upload (same as the single-chip
    encode_core_hostcrc, pipeline.py)."""

    def _core(cur, cur_lens):
        from ..pipeline import encode_core_hostcrc

        return encode_core_hostcrc(cur, cur_lens)

    mapped = shard_map(
        _core,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_decode_core(mesh: Mesh, out_width: int):
    """shard_map'd CM decode + inverse BWT (no device CRC: the wave
    scheduler verifies on the host hardware CRC after the post-passes,
    pipeline.py decode_blocks — the old device crc32_batch here was
    computed and then DISCARDED by the caller, a whole extra device
    stage per wave that made sharded decode slower than unsharded,
    PERF_NOTES R4.6/R5.1)."""

    def _core(payload, payload_lens, sbb_lens, bwt_idx):
        from ..pipeline import _cm_impl

        if _cm_impl() == "pallas":
            from ..ops.device.cm_pallas import cm_decode_pallas_batch

            u = cm_decode_pallas_batch(payload, payload_lens, sbb_lens, out_width)
        else:
            u = cm_decode_batch(payload, payload_lens, sbb_lens, out_width)
        data = bwt_inverse_batch(u, sbb_lens, bwt_idx)
        return data

    mapped = shard_map(
        _core,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_pipeline(block_size: int, mesh: Mesh | None = None):
    """A DevicePipeline whose device cores run shard_map'd over a mesh.

    Wave padding keeps every core call a multiple of the mesh size
    (``wave_multiple``), so callers may submit any batch size.
    """
    from ..pipeline import DevicePipeline

    if mesh is None:
        mesh = make_mesh()
    pipe = DevicePipeline(block_size)
    pipe.wave_multiple = mesh.devices.size
    enc = sharded_encode_core(mesh)
    dec_cache = {}

    def encode_core_fn(orig, orig_lens, cur, cur_lens):
        crc, idx, payload, plens, ok, _total = enc(orig, orig_lens, cur, cur_lens)
        return crc, idx, payload, plens, ok

    def decode_core_fn(payload, payload_lens, sbb_lens, bwt_idx, out_width):
        if out_width not in dec_cache:
            dec_cache[out_width] = sharded_decode_core(mesh, out_width)
        return dec_cache[out_width](payload, payload_lens, sbb_lens, bwt_idx)

    pipe.encode_core_fn = encode_core_fn
    pipe.encode_core_hostcrc_fn = sharded_encode_core_hostcrc(mesh)
    pipe.decode_core_fn = decode_core_fn
    pipe.mesh = mesh
    return pipe
