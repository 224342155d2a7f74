"""Multi-host (pod-slice) block parallelism.

The reference has no distributed layer at all (SURVEY.md §2: pthread
join is the only barrier).  The TPU-native scale-out story:

1. ``initialize()`` — ``jax.distributed`` bootstrap (one process per
   host, standard coordinator env vars).
2. Every host reads its stripe of the input (block i belongs to host
   ``i % num_hosts`` — striping keeps per-host IO sequential per
   stride and needs no coordination).
3. The encode cores run shard_map'd over the GLOBAL mesh exactly as in
   sharding.py — XLA places per-host shards on local chips and the
   only cross-host traffic is the byte-count psum (ICI/DCN).
4. Variable-length bitstreams cross hosts as fixed ``bound()``-padded
   rows plus a length vector (the static pad is what makes the gather
   a plain all-gather); ``gather_to_writer`` assembles every host's
   payloads on host 0 (chunked staging, writer-only retention), which
   writes the frame in block order.

Single-host processes degrade gracefully: ``initialize`` is a no-op
when no coordinator is configured, and the global mesh is the local
mesh.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap; no-op without a coordinator."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()), axis_names=("dp",))


def host_stripe(n_blocks: int) -> range:
    """Block indices this host owns (striped assignment)."""
    return range(jax.process_index(), n_blocks, jax.process_count())


def make_global_batch(mesh: Mesh, local_rows: np.ndarray) -> jax.Array:
    """Assemble a process-sharded global array from per-host rows.

    local_rows: [K_local, ...] — this host's shard.  The global shape
    is [K_local * num_processes, ...] sharded over 'dp'.
    """
    sharding = NamedSharding(mesh, P("dp", *([None] * (local_rows.ndim - 1))))
    global_shape = (local_rows.shape[0] * jax.process_count(),) + local_rows.shape[1:]
    local_devices = mesh.local_devices
    per_dev = np.array_split(local_rows, len(local_devices))
    arrays = [jax.device_put(a, d) for a, d in zip(per_dev, local_devices)]
    return jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)


def gather_to_writer(payloads: jax.Array, lengths: jax.Array):
    """Gather the padded payload rows and lengths so the writer host can
    slice and write them in frame order.

    payloads: [K_global, W] sharded over 'dp'.  Returns numpy copies on
    the writer host (process 0); other processes get ``None`` payloads
    (they participate in the collective but retain nothing).  A jit
    identity with ``out_shardings=None`` would *preserve* the input
    sharding (np.asarray then raises on a non-fully-addressable
    array), so rows are explicitly gathered.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Chunked gather: the collective is an all-gather (JAX has no
        # rooted gather), but staging it CHUNK_ROWS rows at a time
        # bounds every host's peak staging memory to one chunk, and
        # only the writer host retains the assembled rows.
        CHUNK_ROWS = 64
        lens = np.asarray(multihost_utils.process_allgather(lengths, tiled=True))
        k = payloads.shape[0]
        if jax.process_index() == 0:
            out = np.empty((k,) + payloads.shape[1:], dtype=payloads.dtype)
        else:
            out = None
        for lo in range(0, k, CHUNK_ROWS):
            hi = min(k, lo + CHUNK_ROWS)
            chunk = multihost_utils.process_allgather(
                payloads[lo:hi], tiled=True
            )
            if out is not None:
                out[lo:hi] = np.asarray(chunk)
        return out, lens
    mesh = getattr(payloads.sharding, "mesh", None)
    if mesh is not None:
        rep = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())
        )
        payloads, lengths = rep(payloads), rep(lengths)
    return np.asarray(payloads), np.asarray(lengths)
