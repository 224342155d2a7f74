"""Batched block pipeline — the high-throughput device path.

The block is the unit of data parallelism (as in the reference's
bz3_encode_blocks pthread fan-out, src/libbz3.c:845-870).  A batch of K
blocks is split into fixed-shape WAVES of W rows; each wave runs:

  encode:  crc32_batch ∥ (host RLE/LZP pre-pass) → bwt_forward_batch
           → cm_encode_batch                        (one jitted program)
  decode:  cm_decode_batch → bwt_inverse_batch      (one jitted program)
           → host un-LZP/un-RLE → CRC verify

Waves exist for OVERLAP, not for memory alone: JAX dispatch is async,
so wave i+1's host pre-pass, padding and H2D upload run while wave i
computes on device, and wave i's D2H pull (started with
``copy_to_host_async`` the moment its lengths resolve) streams back
while later waves compute.  On the measured tunnel (D2H ~15 MB/s,
PERF_NOTES §3) hiding the pulls is worth ~20% of decode wall.

Host pre/post passes handle the byte-serial dictionary stages until
their Pallas kernels land; everything O(n log n) or state-heavy runs on
device.  Multi-chip scaling shards the wave axis over a mesh — see
bzip3_tpu.parallel.sharding.

Set BZ3_TPU_PROFILE=1 to collect per-stage wall times (printable via
``DevicePipeline.timer.summary()``; bench.py prints it).
"""

from __future__ import annotations

import struct
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import os

from .container.bound import bound, SMALL_BLOCK_THRESHOLD
from .errors import Bz3Error, BZ3_ERR_BWT, BZ3_ERR_CRC, BZ3_ERR_MALFORMED_HEADER
from .models.block_codec import parse_block_header
from .ops.device import crc32_batch_auto as crc32_batch
from .ops.device.bwt import bwt_forward_batch, bwt_inverse_batch
from .ops.device.cm import cm_encode_batch, cm_decode_batch
from .ops.device.cm_parallel import cm_encode_parallel_batch
from .utils.profiling import StageTimer

# The parallel CM encoder materializes ~50 bytes of event state per
# input byte; above this block size fall back to the scan formulation.
_CM_PARALLEL_MAX_N = 2 << 20


def _cm_impl() -> str:
    """CM stage implementation: BZ3_TPU_CM in {auto, pallas, parallel,
    scan}.  auto = the Pallas lane kernel on real TPU (the on-core loop
    dodges this backend's per-step dispatch floor, see
    ops/device/cm_pallas.py), the XLA formulations elsewhere (the
    interpreted Pallas kernel is a multi-minute CPU compile)."""
    mode = os.environ.get("BZ3_TPU_CM", "auto")
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return {"pallas": "pallas", "parallel": "xla", "scan": "scan"}.get(mode, "xla")


# Host pre/post passes: prefer the native (C++) stage codecs, fall
# back to the NumPy oracles when no toolchain is available.
try:
    from .ops.native import lzp_encode, lzp_decode, rle_encode, rle_decode

    lzp_encode(b"\x00" * 128)  # force compile/load early; validates ABI
except Exception:  # pragma: no cover - toolchain-less environments
    from .ops.ref.lzp import lzp_encode, lzp_decode
    from .ops.ref.rle import rle_encode, rle_decode

# Host-side CRC32 for the decode-verify step.  The device crc32_batch
# kernel stays in the encode core (it reads data already resident on
# device); on decode the final bytes live on the HOST after un-LZP/RLE,
# so verifying there avoids a padded re-upload + an extra device
# dispatch per wave.  Native (SSE4.2 hardware CRC, ~7 GiB/s) preferred;
# NumPy oracle otherwise.  BZ3_TPU_DEVICE_CRC_VERIFY=1 forces the old
# device-batched verify (used by tests to pin kernel parity).
try:
    from .ops.native import crc32 as _host_crc32
except Exception:  # pragma: no cover
    from .ops.ref.crc32 import crc32 as _host_crc32

_U32 = struct.Struct("<I")
_S32 = struct.Struct("<i")


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _bwt_row_groups(k: int, width: int) -> int:
    """Rows per BWT sub-launch inside one jitted core program.

    Large-width batches are split so each sort round's working set
    stays within an HBM budget (the prefix-doubling sort materializes
    ~5-7 int32 arrays of the batch shape, ops/device/bwt.py); small
    widths run as one launch.  Static per shape — the python loop in
    the traced core unrolls into sequential sorts in one program.

    Default 128 MiB of row bytes per group (~7 GiB sort peak,
    measured on chip): a [1, 16Mi] sort underutilizes the chip —
    row-batched forward sorts measure 9.5 / 14.9 / 18.1 MB/s at
    1 / 4 / 8 x 16 MiB rows — and the groups run as separate programs
    under split dispatch, so the sort peak never coexists with the CM
    staging."""
    budget = int(float(os.environ.get("BZ3_TPU_BWT_GROUP_MIB", "128")) * (1 << 20))
    rows_cap = int(os.environ.get("BZ3_TPU_BWT_GROUP_ROWS", "16"))
    return max(1, min(k, rows_cap, budget // max(1, width)))


def _device_prepass() -> bool:
    """BZ3_TPU_DEVICE_PREPASS=1 runs RLE and LZP on device too, making
    the device engine self-contained across all four stage codecs
    (reference stages src/libbz3.c:84-329): RLE as the batched XLA
    kernels (ops/device/rle.py), LZP as the scalar-unit Pallas state
    machine (ops/device/lzp_pallas.py).  Default off for throughput on
    this box: the host pre-passes run at 213+ MB/s overlapped with
    device compute, while the scalar-unit LZP is serial with the VPU
    stages — the flag exists for self-contained/device-resident
    deployments and for parity coverage, not as the fast path here."""
    return os.environ.get("BZ3_TPU_DEVICE_PREPASS", "0") == "1"


def _lzp_device_ok(width: int) -> bool:
    """Scalar LZP kernel VMEM budget: LUT (1 MiB) + packed in + out."""
    max_mib = float(os.environ.get("BZ3_TPU_LZP_MAX_MIB", "4"))
    return width <= int(max_mib * (1 << 20))


@jax.jit
def encode_core_full(orig, orig_lens):
    """Fully device-resident encode: CRC ∥ RLE → LZP → BWT → CM.

    Returns (crc, idx, payload, plens, ok, model, lzp_lens, rle_lens);
    the host only frames headers.  Stage gating mirrors
    src/libbz3.c:609-621: each pre-pass is kept only if it shrinks.
    """
    from .ops.device.rle import rle_encode_batch
    from .ops.device.lzp_pallas import lzp_encode_pallas_batch

    k_dim, n = orig.shape
    crc = crc32_batch(orig, orig_lens)
    rle_out, rle_lens = rle_encode_batch(orig, orig_lens, out_width=n + 64)
    use_rle = (rle_lens < orig_lens) & (orig_lens >= SMALL_BLOCK_THRESHOLD)
    cur = jnp.where(use_rle[:, None], rle_out[:, :n], orig)
    cur_lens = jnp.where(use_rle, rle_lens, orig_lens)
    lzp_out, lzp_lens = lzp_encode_pallas_batch(cur, cur_lens)
    use_lzp = (
        (lzp_lens > 0)
        & (lzp_lens < cur_lens)
        & (orig_lens >= SMALL_BLOCK_THRESHOLD)
    )
    cur2 = jnp.where(use_lzp[:, None], lzp_out, cur)
    cur2_lens = jnp.where(use_lzp, lzp_lens, cur_lens)

    g = _bwt_row_groups(k_dim, n)
    if g < k_dim:
        parts = [
            bwt_forward_batch(cur2[s : s + g], cur2_lens[s : s + g])
            for s in range(0, k_dim, g)
        ]
        u = jnp.concatenate([p[0] for p in parts], axis=0)
        idx = jnp.concatenate([p[1] for p in parts], axis=0)
    else:
        u, idx = bwt_forward_batch(cur2, cur2_lens)
    if _cm_impl() == "pallas":
        from .ops.device.cm_pallas import cm_encode_pallas_batch

        payload, plens = cm_encode_pallas_batch(u, cur2_lens)
        ok = plens <= payload.shape[1]
    elif cur2.shape[1] <= _CM_PARALLEL_MAX_N:
        payload, plens, ok = cm_encode_parallel_batch(u, cur2_lens)
    else:
        payload, plens = cm_encode_batch(u, cur2_lens)
        ok = plens <= payload.shape[1]
    model = use_lzp.astype(jnp.int32) * 2 + use_rle.astype(jnp.int32) * 4
    return crc, idx, payload, plens, ok, model, lzp_lens, rle_lens


@partial(jax.jit, static_argnames=("out_width",))
def decode_core_full(payload, payload_lens, sbb_lens, bwt_idx, models, orig_sizes, out_width):
    """Fully device-resident decode: CM → unBWT → unLZP → unRLE → CRC.

    Returns (final [K, W], crc [K], stage_ok [K]); the host compares
    crc against the header and applies the remaining hardening checks.
    """
    from .ops.device.rle import rle_decode_batch
    from .ops.device.lzp_pallas import lzp_decode_pallas_batch

    if _cm_impl() == "pallas":
        from .ops.device.cm_pallas import cm_decode_pallas_batch

        u = cm_decode_pallas_batch(payload, payload_lens, sbb_lens, out_width)
    else:
        u = cm_decode_batch(payload, payload_lens, sbb_lens, out_width)
    k_dim = u.shape[0]
    g = _bwt_row_groups(k_dim, out_width)
    if g < k_dim:
        data = jnp.concatenate(
            [
                bwt_inverse_batch(u[s : s + g], sbb_lens[s : s + g], bwt_idx[s : s + g])
                for s in range(0, k_dim, g)
            ],
            axis=0,
        )
    else:
        data = bwt_inverse_batch(u, sbb_lens, bwt_idx)

    has_lzp = (models & 2) != 0
    lzp_in = jnp.where(has_lzp, sbb_lens, 0)
    lzp_out, lzp_olens = lzp_decode_pallas_batch(data, lzp_in, out_width)
    cur = jnp.where(has_lzp[:, None], lzp_out[:, :out_width], data)
    cur_lens = jnp.where(has_lzp, lzp_olens, sbb_lens)
    lzp_ok = jnp.logical_not(has_lzp) | (lzp_olens >= 0)

    has_rle = (models & 4) != 0
    rle_out, rle_ok = rle_decode_batch(
        cur, jnp.where(has_rle, jnp.maximum(cur_lens, 0), 0), orig_sizes, out_width
    )
    final = jnp.where(has_rle[:, None], rle_out, cur)
    final_lens = jnp.where(has_rle, orig_sizes, cur_lens)
    stage_ok = lzp_ok & (jnp.logical_not(has_rle) | rle_ok)
    crc = crc32_batch(final, jnp.maximum(final_lens, 0))
    return final, jnp.maximum(final_lens, 0), crc, stage_ok


@jax.jit
def bwt_fwd_core(cur, cur_lens):
    """Grouped BWT forward as its own program (used when the CM stage
    runs as RESUMABLE multi-launches: fusing a 64 MiB BWT with four CM
    launches into one program crashed the worker — HBM pressure from
    the chained buffers; unfused, each piece is validated)."""
    k_dim, n = cur.shape
    g = _bwt_row_groups(k_dim, n)
    if g < k_dim:
        parts = [
            bwt_forward_batch(cur[s : s + g], cur_lens[s : s + g])
            for s in range(0, k_dim, g)
        ]
        return (
            jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0),
        )
    return bwt_forward_batch(cur, cur_lens)


@partial(jax.jit, static_argnames=())
def bwt_inv_core(u, sbb_lens, bwt_idx):
    k_dim, n = u.shape
    g = _bwt_row_groups(k_dim, n)
    if g < k_dim:
        return jnp.concatenate(
            [
                bwt_inverse_batch(u[s : s + g], sbb_lens[s : s + g], bwt_idx[s : s + g])
                for s in range(0, k_dim, g)
            ],
            axis=0,
        )
    return bwt_inverse_batch(u, sbb_lens, bwt_idx)


def _split_dispatch(width: int) -> bool:
    """True when the stage chain should dispatch as SEPARATE programs
    (per-group BWT cores, the CM launch chain, per-group inverse
    cores) instead of one fused jit program.

    Three reasons, all measured: (a) fusing a wide BWT with a multi-
    launch CM chain into one program crashed the worker at 64 MiB
    (HBM pressure from the chained buffers, PERF_NOTES R3.10);
    (b) separate inverse-BWT group programs let each group's sliced
    D2H pull start the moment that group finishes — at 16 MiB blocks
    the decoded wave is 512 MiB crossing a ~15 MB/s tunnel, so
    overlapping the pull with later groups' compute hides ~30 s;
    (c) the CM stage then sees the WHOLE wave as one lane group
    (32 lanes) instead of being shape-fused per BWT group."""
    if _cm_impl() != "pallas":
        return False
    mib = float(os.environ.get("BZ3_TPU_SPLIT_DISPATCH_MIB", "4"))
    return width >= int(mib * (1 << 20))


@jax.jit
def encode_core_hostcrc(cur, cur_lens):
    """Device encode stages when the checksum is host-side: BWT → CM.

    The raw blocks never reach the device (the hardware CRC32 runs at
    ~7 GiB/s on the host during the overlapped pre-pass), which also
    drops the orig-batch upload.  Returns (idx, payload, plens, ok)."""
    k_dim, n = cur.shape
    g = _bwt_row_groups(k_dim, n)
    if g < k_dim:
        parts = [
            bwt_forward_batch(cur[s : s + g], cur_lens[s : s + g])
            for s in range(0, k_dim, g)
        ]
        u = jnp.concatenate([p[0] for p in parts], axis=0)
        idx = jnp.concatenate([p[1] for p in parts], axis=0)
    else:
        u, idx = bwt_forward_batch(cur, cur_lens)
    impl = _cm_impl()
    if impl == "pallas":
        from .ops.device.cm_pallas import cm_encode_pallas_batch

        payload, plens = cm_encode_pallas_batch(u, cur_lens)
        ok = plens <= payload.shape[1]
    elif impl == "xla" and cur.shape[1] <= _CM_PARALLEL_MAX_N:
        payload, plens, ok = cm_encode_parallel_batch(u, cur_lens)
    else:
        payload, plens = cm_encode_batch(u, cur_lens)
        ok = plens <= payload.shape[1]
    return idx, payload, plens, ok


@jax.jit
def encode_core(orig, orig_lens, cur, cur_lens):
    """Device encode stages for a [K, N] batch.

    orig: raw blocks (for the checksum); cur: blocks after optional
    host RLE/LZP.  Returns (crc [K], bwt_idx [K], payload [K, W],
    payload_lens [K], ok [K] bool).

    The CM stage uses the parallel 3-phase encoder (sorted per-slot
    counter chains + table-free range pass, ops/device/cm_parallel.py)
    for block sizes it fits in memory for; the lane-interleaved scan
    otherwise.  ``ok[k]`` is False when that row's payload could not be
    produced exactly (per-step emission-slot overflow in the parallel
    encoder, or payload length exceeding the padded width) — callers
    MUST re-encode those rows through another engine.
    """
    k_dim, n = cur.shape
    crc = crc32_batch(orig, orig_lens)
    g = _bwt_row_groups(k_dim, n)
    if g < k_dim:
        parts = [
            bwt_forward_batch(cur[s : s + g], cur_lens[s : s + g])
            for s in range(0, k_dim, g)
        ]
        u = jnp.concatenate([p[0] for p in parts], axis=0)
        idx = jnp.concatenate([p[1] for p in parts], axis=0)
    else:
        u, idx = bwt_forward_batch(cur, cur_lens)
    impl = _cm_impl()
    if impl == "pallas":
        from .ops.device.cm_pallas import cm_encode_pallas_batch

        payload, plens = cm_encode_pallas_batch(u, cur_lens)
        ok = plens <= payload.shape[1]
    elif impl == "xla" and cur.shape[1] <= _CM_PARALLEL_MAX_N:
        payload, plens, ok = cm_encode_parallel_batch(u, cur_lens)
    else:
        payload, plens = cm_encode_batch(u, cur_lens)
        ok = plens <= payload.shape[1]
    return crc, idx, payload, plens, ok


@partial(jax.jit, static_argnames=("out_width",))
def decode_core(payload, payload_lens, sbb_lens, bwt_idx, out_width):
    """Device decode stages: CM decode then inverse BWT."""
    if _cm_impl() == "pallas":
        from .ops.device.cm_pallas import cm_decode_pallas_batch

        u = cm_decode_pallas_batch(payload, payload_lens, sbb_lens, out_width)
    else:
        u = cm_decode_batch(payload, payload_lens, sbb_lens, out_width)
    k_dim = u.shape[0]
    g = _bwt_row_groups(k_dim, out_width)
    if g < k_dim:
        data = jnp.concatenate(
            [
                bwt_inverse_batch(
                    u[s : s + g], sbb_lens[s : s + g], bwt_idx[s : s + g]
                )
                for s in range(0, k_dim, g)
            ],
            axis=0,
        )
    else:
        data = bwt_inverse_batch(u, sbb_lens, bwt_idx)
    return data


def _pad_batch(chunks: list[bytes], width: int, rows: int | None = None):
    k = rows if rows is not None else len(chunks)
    arr = np.zeros((k, width), dtype=np.uint8)
    lens = np.zeros(k, dtype=np.int32)
    for i, c in enumerate(chunks):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        lens[i] = len(c)
    return jnp.asarray(arr), jnp.asarray(lens)


def _start_d2h(arr):
    """Begin an async device→host copy if the array supports it."""
    try:
        arr.copy_to_host_async()
    except Exception:
        pass
    return arr


def _bwt_difficulty(b: bytes) -> float:
    """Distinct sampled-8-gram ratio — a cheap host-side proxy for the
    prefix-doubling round count (repeat-heavy rows resolve late).  Used
    to ORDER rows inside a wave so the BWT sub-launches are homogeneous:
    one pathological row then gates only its own group's full rounds,
    not the whole wave's (measured: 4 periodic rows dragged a mixed
    [16x1MiB] batch to 1.97 MB/s when interleaved)."""
    if len(b) < 4096:
        return 1.0
    a = np.frombuffer(b, np.uint8)
    step = max(1, (len(b) - 8) // 2048)
    idx = np.arange(0, len(b) - 8, step)[:2048]
    g = np.lib.stride_tricks.sliding_window_view(a, 8)[idx]
    weights = (np.uint64(1) << (np.arange(8, dtype=np.uint64) * 8))
    v = g.astype(np.uint64) @ weights
    return float(len(np.unique(v))) / len(v)


def _pull_meta(*arrs):
    """Pull several small per-row arrays as ONE stacked transfer.

    Each np.asarray through the accelerator tunnel is a round trip;
    per wave that adds up (4 metas x waves).  Host-side (numpy) entries
    pass through; the device-resident ones pull stacked."""
    out = list(arrs)
    dev = [i for i, a in enumerate(arrs) if isinstance(a, jax.Array)]
    if len(dev) > 1:
        try:
            # i32 carrier: u32 CRCs ride as their two's-complement bit
            # pattern (consumers mask with & 0xFFFFFFFF).
            m = np.asarray(
                jnp.stack([arrs[i].astype(jnp.int32) for i in dev])
            )
            for j, i in enumerate(dev):
                out[i] = m[j]
            dev = []
        except Exception:
            pass
    for i in dev:
        out[i] = np.asarray(arrs[i])
    return [np.asarray(a) for a in out]


class DevicePipeline:
    """Batched encoder/decoder bound to one block size.

    ``encode_core_fn`` / ``decode_core_fn`` may be overridden with
    sharded versions (see parallel.sharding.sharded_pipeline) — the
    host-side framing and wave scheduling are identical.  Overriders
    that need wave sizes in fixed multiples (a mesh axis) set
    ``wave_multiple``.
    """

    def __init__(self, block_size: int, use_rle: bool = True, use_lzp: bool = True):
        # Device block ceiling.  The TPU runtime's kernel-duration
        # watchdog kills the worker past ~2 minutes of kernel time
        # (measured: a 64 Mi-step single CM launch crashes it, 32 Mi
        # survives) — the RESUMABLE CM (state spill/reload between
        # <= 16 Mi-step launches, PERF_NOTES R3.8) removes that limit,
        # so the remaining cap is HBM.  The CM lane group pads to 8
        # rows; at 128 MiB blocks the CM staging (in 4 GiB + out
        # ~4.6 GiB, i32-per-byte) and the BWT sort working set (~7 GiB
        # with stride-4 full rounds past BZ3_TPU_BWT_WIDE_MIB, bwt.py)
        # run in SEPARATE programs (split dispatch), so the peak stays
        # ~10 GiB of the 16 GiB chip.  256 MiB would not fit; the
        # format max 511 MiB (src/libbz3.c:536) needs the native
        # engine.
        max_mib = float(os.environ.get("BZ3_TPU_MAX_DEVICE_BLOCK_MIB", "128"))
        # Past the cap the engine switches to the HOST-BWT HYBRID
        # (docs/design_round5.md §3b): SA-IS / quad-merge inverse on
        # the host, CM on device with capped/chunked staging — covering
        # the format's full 65 KiB..511 MiB range (src/libbz3.c:536)
        # without the forward sort's >= 10 GiB working set.
        self.oversize = block_size > int(max_mib * (1 << 20)) and (
            jax.default_backend() == "tpu"
            or os.environ.get("BZ3_TPU_FORCE_OVERSIZE", "0") == "1"
        )
        self.block_size = block_size
        self.width = _round_up(max(64, block_size), 256)
        self.use_rle = use_rle
        self.use_lzp = use_lzp
        self.encode_core_fn = encode_core
        self.decode_core_fn = decode_core
        # Optional override of the host-CRC encode core (see _host_crc).
        self.encode_core_hostcrc_fn = None
        self.wave_multiple = 1
        self.timer = StageTimer()

    def _bucket_width(self, need: int) -> int:
        """Device array width for a wave: the stage kernels pay for the
        PADDED width (sorts/CM steps run over every column), so padding
        post-LZP rows to the full block width wastes their shrink
        (~25-35% of BWT+CM on text).  Bucket to width/8 steps — at most
        8 shapes per block size."""
        step = max(256, _round_up(self.width // 8, 256))
        return min(self.width, _round_up(max(need, 64), step))

    def _host_crc(self) -> bool:
        """Encode-side CRC32 on the host (default): the hardware CRC
        runs at ~7 GiB/s inside the overlapped pre-pass, and skipping
        the device CRC also skips the raw-batch upload (the device only
        ever sees post-prepass rows).  BZ3_TPU_HOST_CRC=0 restores the
        on-device CRC path (the kernel stays tested either way)."""
        if os.environ.get("BZ3_TPU_HOST_CRC", "1") != "1":
            return False
        # Overridden cores (e.g. sharded) opt in by also setting
        # encode_core_hostcrc_fn; a bare encode_core_fn override (tests,
        # wrappers) keeps the CRC inside that core.
        return (
            self.encode_core_fn is encode_core
            or self.encode_core_hostcrc_fn is not None
        )

    def _full_cores(self) -> bool:
        """Device-resident pre/post passes only apply to the stock
        cores (sharded overriders keep the host passes)."""
        return (
            _device_prepass()
            and self.encode_core_fn is encode_core
            and self.decode_core_fn is decode_core
        )

    # -- wave scheduling --------------------------------------------------

    def _wave_size(self) -> int:
        """Target rows per wave: fill the CM kernel's lane group, bounded
        by an HBM budget for wide blocks.  Env BZ3_TPU_WAVE overrides."""
        env = int(os.environ.get("BZ3_TPU_WAVE", "0"))
        if env > 0:
            w = env
        else:
            budget = int(float(os.environ.get("BZ3_TPU_WAVE_MIB", "512")) * (1 << 20))
            w = max(8, min(32, budget // max(1, self.width)))
        return max(self.wave_multiple, _round_up(w, self.wave_multiple))

    def _wave_splits(self, k: int) -> list[tuple[int, int]]:
        """[(count, padded_rows)] covering k blocks.  Full waves use the
        wave size; the tail splits into power-of-two buckets so shape
        recompiles stay bounded and zero-row padding stays < count."""
        wave = self._wave_size()
        out = []
        i = 0
        while i < k:
            rem = k - i
            if rem >= wave:
                c = wave
            else:
                c = 1
                while c * 2 <= rem:
                    c *= 2
            rows = max(self.wave_multiple, _round_up(c, self.wave_multiple))
            out.append((min(c, rem), rows))
            i += min(c, rem)
        return out

    # -- encode ---------------------------------------------------------

    def encode_blocks(self, blocks: list[bytes]) -> list[bytes]:
        """Encode a batch of blocks into BZ3v1 block bytes (hdr+payload)."""
        t = self.timer
        for data in blocks:
            if len(data) > self.block_size:
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER, "block exceeds block size")
        if self.oversize:
            return self._encode_blocks_oversize(blocks)

        full = (
            self._full_cores()
            and self.use_rle
            and self.use_lzp
            and _lzp_device_ok(self.width)
        )

        # Phase A: per wave — host pre-pass (unless device-resident),
        # pad, async dispatch.
        waves = []  # (start, count, metas, core outputs)
        start = 0
        for count, rows in self._wave_splits(len(blocks)):
            chunk = blocks[start : start + count]
            metas = None
            host_crc = False
            if not full:
                metas = []  # (model, lzp_size, rle_size, cur)
                host_crc = self._host_crc()
                with t.stage("encode/host_prepass"):
                    crcs = np.zeros(rows, np.int64) if host_crc else None
                    for bi, data in enumerate(chunk):
                        model, lzp_size, rle_size, cur = 0, -1, -1, data
                        if host_crc:
                            crcs[bi] = _host_crc32(data)
                        if len(data) >= SMALL_BLOCK_THRESHOLD:
                            if self.use_rle:
                                r = rle_encode(cur)
                                if len(r) < len(cur):
                                    cur, rle_size, model = r, len(r), model | 4
                            if self.use_lzp:
                                l = lzp_encode(cur)
                                if l is not None and len(l) < len(cur):
                                    cur, lzp_size, model = l, len(l), model | 2
                        metas.append((model, lzp_size, rle_size, cur))
            perm = None
            if not full and count > 1:
                # Order rows by BWT difficulty so the forward sub-
                # launches are homogeneous — a pathological row then
                # pays its deep doubling rounds only within its own
                # group (see _bwt_difficulty).
                diffs = [_bwt_difficulty(m[3]) for m in metas]
                if max(diffs) - min(diffs) > 0.05:
                    perm = sorted(range(count), key=lambda j: diffs[j])
                    metas = [metas[p] for p in perm]
                    if host_crc:
                        crcs[:count] = crcs[np.asarray(perm)]
            with t.stage("encode/pad_h2d"):
                if full:
                    orig_arr, orig_lens = _pad_batch(chunk, self.width, rows)
                else:
                    cw = self._bucket_width(
                        max((len(m[3]) for m in metas), default=64)
                    )
                    # In the split-dispatch regime the upload happens
                    # PER BWT GROUP inside the dispatch loop (the first
                    # group's sort starts after 1/groups of the wave
                    # has crossed the ~21 MB/s tunnel instead of all of
                    # it — worth ~18 s on a 512 MiB wave).
                    group_h2d = (
                        host_crc
                        and self.encode_core_hostcrc_fn is None
                        and _split_dispatch(cw)
                        and _bwt_row_groups(rows, cw) < rows
                    )
                    if not group_h2d:
                        cur_arr, cur_lens = _pad_batch(
                            [m[3] for m in metas], cw, rows
                        )
                    if not host_crc:
                        orig_arr, orig_lens = _pad_batch(
                            [chunk[p] for p in perm] if perm else chunk,
                            self.width,
                            rows,
                        )
            with t.stage("encode/dispatch"):
                if full:
                    outs = encode_core_full(orig_arr, orig_lens)
                elif host_crc:
                    core = self.encode_core_hostcrc_fn or encode_core_hostcrc
                    if core is encode_core_hostcrc and _split_dispatch(cw):
                        # Split-dispatch regime (see _split_dispatch):
                        # one program per BWT group, then the CM launch
                        # chain over the WHOLE wave — the CM kernel
                        # lane-fills across groups (enc 8.9 MB/s at
                        # L=8 vs 12.75 at L=32 on chip).
                        from .ops.device.cm_pallas import (
                            cm_encode_pallas_batch,
                        )

                        g = _bwt_row_groups(rows, cw)
                        if group_h2d:
                            # pad + upload + dispatch one group at a
                            # time: group s+1's transfer rides the
                            # tunnel while group s sorts
                            parts = []
                            for s in range(0, rows, g):
                                ga, gl = _pad_batch(
                                    [m[3] for m in metas[s : s + g]], cw, g
                                )
                                parts.append(bwt_fwd_core(ga, gl))
                            # groups pad to g rows (shape-stable): trim
                            # any overhang past the wave's rows
                            u = jnp.concatenate([p[0] for p in parts], axis=0)[:rows]
                            idx = jnp.concatenate([p[1] for p in parts], axis=0)[:rows]
                            lens_np = np.zeros(rows, np.int32)
                            lens_np[:count] = [len(m[3]) for m in metas]
                            cur_lens = jnp.asarray(lens_np)
                        elif g < rows:
                            parts = [
                                bwt_fwd_core(
                                    cur_arr[s : s + g], cur_lens[s : s + g]
                                )
                                for s in range(0, rows, g)
                            ]
                            u = jnp.concatenate([p[0] for p in parts], axis=0)
                            idx = jnp.concatenate([p[1] for p in parts], axis=0)
                        else:
                            u, idx = bwt_fwd_core(cur_arr, cur_lens)
                        payload, plens = cm_encode_pallas_batch(u, cur_lens)
                        outs = (crcs, idx, payload, plens,
                                plens <= payload.shape[1])
                    else:
                        idx, payload, plens, ok = core(cur_arr, cur_lens)
                        outs = (crcs, idx, payload, plens, ok)
                else:
                    outs = self.encode_core_fn(
                        orig_arr, orig_lens, cur_arr, cur_lens
                    )
            waves.append((start, count, metas, outs, perm if not full else None))
            start += count

        # Phase B: per wave — sync lengths, slice + start async D2H.
        # The pull of wave i streams back while waves i+1.. compute.
        pulled = []
        for wstart, count, metas, outs, perm in waves:
            if full:
                crc, idx, payload, plens, ok, model_a, lzp_a, rle_a = outs
            else:
                crc, idx, payload, plens, ok = outs
            with t.stage("encode/sync_meta"):
                if full:
                    crc, idx, plens_np, ok, model_a, lzp_a, rle_a = _pull_meta(
                        crc, idx, plens, ok, model_a, lzp_a, rle_a
                    )
                else:
                    crc, idx, plens_np, ok = _pull_meta(crc, idx, plens, ok)
                if full:
                    metas = [
                        (
                            int(model_a[i]),
                            int(lzp_a[i]) if model_a[i] & 2 else -1,
                            int(rle_a[i]) if model_a[i] & 4 else -1,
                            None,
                        )
                        for i in range(count)
                    ]
            with t.stage("encode/slice_payload"):
                # Device->host through the accelerator tunnel runs
                # ~15 MB/s (measured; H2D is ~400), so never pull the
                # padded payload width: slice to the longest real
                # payload on device first (a 5-6x transfer cut).
                max_len = min(int(plens_np.max(initial=0)), payload.shape[1])
                pay = _start_d2h(payload[:, :max_len])
            pulled.append(
                (wstart, count, metas, crc, idx, plens_np, ok, pay, perm)
            )

        out = []
        for wstart, count, metas, crc, idx, plens, ok, pay, perm in pulled:
            with t.stage("encode/d2h_payload"):
                pay = np.asarray(pay)
            with t.stage("encode/assemble"):
                wave_out = [b""] * count
                for i in range(count):
                    # row i of the device arrays holds original block
                    # perm[i] when difficulty ordering permuted the wave
                    oi = perm[i] if perm is not None else i
                    data = blocks[wstart + oi]
                    model, lzp_size, rle_size, _ = metas[i]
                    if len(data) < SMALL_BLOCK_THRESHOLD:
                        wave_out[oi] = (
                            _U32.pack(int(crc[i]) & 0xFFFFFFFF)
                            + _S32.pack(-1)
                            + data
                        )
                        continue
                    if not bool(ok[i]):
                        # cm_parallel certification failure / emission
                        # overflow, or a payload exceeding the padded
                        # width: re-encode this block through the exact
                        # serial path (ops.ref) — slow, guaranteed, and
                        # byte-identical by the cross-engine parity
                        # contract (never silently emit a corrupt
                        # stream).
                        from .models.block_codec import encode_block

                        wave_out[oi] = encode_block(data)
                        continue
                    hdr = bytearray(
                        _U32.pack(int(crc[i]) & 0xFFFFFFFF)
                        + _S32.pack(int(idx[i]))
                    )
                    hdr.append(model)
                    if model & 2:
                        hdr += _S32.pack(lzp_size)
                    if model & 4:
                        hdr += _S32.pack(rle_size)
                    wave_out[oi] = bytes(hdr) + pay[i, : plens[i]].tobytes()
                out.extend(wave_out)
        return out

    # -- decode ---------------------------------------------------------

    def decode_blocks(self, blocks: list[tuple[bytes, int]]) -> list[bytes]:
        """Decode a batch of (block_bytes, orig_size) pairs.

        Mirrors every hardening check of bz3_decode_block
        (src/libbz3.c:656-809) via models.block_codec.parse_block_header
        plus the bound checks below.
        """
        t = self.timer
        if self.oversize:
            return self._decode_blocks_oversize(blocks)
        bnd = bound(self.block_size)
        headers = []
        payloads = []
        sbbs = []
        idxs = []
        literal = {}
        with t.stage("decode/parse_headers"):
            for i, (block, orig_size) in enumerate(blocks):
                if len(block) > bnd:
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                hdr = parse_block_header(block)
                if hdr.is_literal:
                    data = block[8:]
                    if len(data) > 64:
                        raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                    literal[i] = (data, hdr.crc32)
                    headers.append(hdr)
                    payloads.append(b"")
                    sbbs.append(0)
                    idxs.append(0)
                    continue
                if (hdr.model & 2 and not (0 <= hdr.lzp_size <= bnd)) or (
                    hdr.model & 4 and not (0 <= hdr.rle_size <= bnd)
                ):
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                if orig_size > bnd or orig_size < 0:
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                if hdr.model & 2:
                    sbb = hdr.lzp_size
                elif hdr.model & 4:
                    sbb = hdr.rle_size
                else:
                    sbb = orig_size
                if hdr.bwt_idx > sbb or sbb > self.width:
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                headers.append(hdr)
                payloads.append(block[hdr.header_size() :])
                sbbs.append(sbb)
                idxs.append(hdr.bwt_idx)

        # Bucket the payload width (power of two, shared across waves)
        # to bound recompiles.
        pw = 64
        while pw < max(map(len, payloads), default=1):
            pw <<= 1

        full = self._full_cores() and _lzp_device_ok(self.width)

        # Phase A: dispatch every wave, starting the async D2H pull the
        # moment the (host-known) real row extent is computed.
        waves = []
        start = 0
        for count, rows in self._wave_splits(len(blocks)):
            sl = slice(start, start + count)
            with t.stage("decode/pad_h2d"):
                pay_arr, pay_lens = _pad_batch(payloads[sl], pw, rows)
                sbb_w = np.zeros(rows, np.int32)
                sbb_w[:count] = sbbs[sl]
                idx_w = np.zeros(rows, np.int32)
                idx_w[:count] = idxs[sl]
            with t.stage("decode/dispatch"):
                if full:
                    mdl_w = np.zeros(rows, np.int32)
                    osz_w = np.zeros(rows, np.int32)
                    for j in range(count):
                        if (start + j) in literal:
                            continue  # inert row; host path handles it
                        mdl_w[j] = headers[start + j].model
                        osz_w[j] = blocks[start + j][1]
                    final, final_lens, crcs, stage_ok = decode_core_full(
                        pay_arr,
                        pay_lens,
                        jnp.asarray(sbb_w),
                        jnp.asarray(idx_w),
                        jnp.asarray(mdl_w),
                        jnp.asarray(osz_w),
                        self.width,
                    )
                    data = (
                        _start_d2h(final[:count, : max(1, int(osz_w.max()))]),
                        final_lens,
                        crcs,
                        stage_ok,
                    )
                else:
                    # Output width bucketed to the wave's real need:
                    # CM decode steps and the inverse-BWT arrays scale
                    # with this width, so post-LZP shrink is captured.
                    ow = self._bucket_width(max(1, max(sbbs[sl], default=1)))
                    sl_w = max(1, max(sbbs[sl], default=1))
                    if self.decode_core_fn is decode_core and _split_dispatch(ow):
                        # Split-dispatch regime (see _split_dispatch):
                        # the CM launch chain over the whole wave
                        # (lane-filled), then one program PER inverse-
                        # BWT group with that group's sliced D2H pull
                        # started immediately — the pull of group s
                        # streams back through the slow tunnel while
                        # groups s+1.. compute.
                        from .ops.device.cm_pallas import (
                            cm_decode_pallas_batch,
                        )

                        # metadata uploads ONCE; per-group slices are
                        # device-side (a host-slice jnp.asarray per
                        # group was 2 tunnel round trips x groups)
                        sbb_dev = jnp.asarray(sbb_w)
                        idx_dev = jnp.asarray(idx_w)
                        u = cm_decode_pallas_batch(
                            pay_arr, pay_lens, sbb_dev, ow
                        )
                        # inverse groups run SMALLER than the forward
                        # sort groups: the latency-bound inverse gains
                        # nothing from bigger batches (R5.3 fused-node
                        # A/B: 8.47 MB/s at [1x16Mi] vs 6.71 at
                        # [4x16Mi] same session), and smaller groups
                        # start their sliced D2H pulls earlier (64 MiB
                        # groups measured 2.87 vs 2.71 MiB/s e2e in
                        # r4; BZ3_TPU_INV_GROUP_MIB re-A/Bs it)
                        inv_mib = int(
                            os.environ.get("BZ3_TPU_INV_GROUP_MIB", "16")
                        )
                        g = min(
                            _bwt_row_groups(rows, ow),
                            max(1, (inv_mib << 20) // max(1, ow)),
                        )
                        data = []
                        for s in range(0, rows, g):
                            if s >= count:
                                break  # rows past count are padding
                            dg = bwt_inv_core(
                                u[s : s + g],
                                sbb_dev[s : s + g],
                                idx_dev[s : s + g],
                            )
                            data.append(
                                (s, _start_d2h(dg[: min(g, count - s), :sl_w]))
                            )
                    else:
                        data = self.decode_core_fn(
                            pay_arr,
                            pay_lens,
                            jnp.asarray(sbb_w),
                            jnp.asarray(idx_w),
                            ow,
                        )
                        # Rows only hold sbb bytes (the post-LZP/RLE
                        # size, typically well under the block width) —
                        # slice on device before the pull, then stream
                        # it back while later waves compute.
                        data = _start_d2h(data[:count, :sl_w])
            waves.append((start, count, data))
            start += count

        # Phase B: per wave — pull, host post-passes, CRC verify.
        finals = [b""] * len(blocks)
        device_verify = os.environ.get("BZ3_TPU_DEVICE_CRC_VERIFY", "0") == "1"
        if full:
            for wstart, count, (final, final_lens, crcs, stage_ok) in waves:
                with t.stage("decode/d2h"):
                    final = np.asarray(final)
                    final_lens = np.asarray(final_lens)
                    crcs = np.asarray(crcs)
                    stage_ok = np.asarray(stage_ok)
                with t.stage("decode/verify"):
                    for i in range(wstart, wstart + count):
                        j = i - wstart
                        if i in literal:
                            finals[i] = literal[i][0]
                            if int(_host_crc32(finals[i])) != literal[i][1]:
                                raise Bz3Error(BZ3_ERR_CRC)
                            continue
                        if not bool(stage_ok[j]):
                            raise Bz3Error(BZ3_ERR_CRC)
                        ln = int(final_lens[j])
                        if ln > self.block_size:
                            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                        if int(crcs[j]) & 0xFFFFFFFF != headers[i].crc32:
                            raise Bz3Error(BZ3_ERR_CRC)
                        finals[i] = final[j, :ln].tobytes()
            return finals
        for wstart, count, data in waves:
            # Per-GROUP post-processing: pull group k, host-unLZP/RLE +
            # CRC-verify its blocks while groups k+1.. are still
            # computing / streaming back (their async D2H was started
            # at dispatch) — the ~9 s/512 MiB host post + verify was
            # fully exposed after the last pull before this (R4.9's
            # largest single decode-overhead term).
            parts = data if isinstance(data, list) else [(0, data)]
            for s0, part in parts:
                with t.stage("decode/d2h"):
                    arr = np.asarray(part)
                with t.stage("decode/host_post"):
                    lo = wstart + s0
                    hi = min(lo + arr.shape[0], wstart + count)
                    for i in range(lo, hi):
                        if i in literal:
                            finals[i] = literal[i][0]
                            continue
                        hdr = headers[i]
                        cur = arr[i - lo, : sbbs[i]].tobytes()
                        if hdr.model & 2:
                            cur = lzp_decode(cur, bnd)
                            if cur is None:
                                raise Bz3Error(BZ3_ERR_CRC)
                        if hdr.model & 4:
                            cur = rle_decode(cur, blocks[i][1])
                            if cur is None:
                                raise Bz3Error(BZ3_ERR_CRC)
                        if len(cur) > self.block_size:
                            raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                        finals[i] = cur
                if not device_verify:
                    with t.stage("decode/crc_verify"):
                        for i in range(lo, hi):
                            want = literal[i][1] if i in literal else headers[i].crc32
                            if int(_host_crc32(finals[i])) != want:
                                raise Bz3Error(BZ3_ERR_CRC)

        if device_verify:
            # Device-batched verify of every decoded block (incl.
            # literals) — pins the device CRC kernel's parity.
            with t.stage("decode/crc_verify"):
                f_arr, f_lens = _pad_batch(finals, self.width)
                crcs = np.asarray(crc32_batch(f_arr, f_lens))
                for i in range(len(blocks)):
                    want = literal[i][1] if i in literal else headers[i].crc32
                    if int(crcs[i]) != want:
                        raise Bz3Error(BZ3_ERR_CRC)
        return finals

    # -- oversize blocks: host-BWT hybrid -------------------------------
    #
    # Blocks past the device HBM cap (256-511 MiB; format range
    # src/libbz3.c:536) run the BWT on the HOST — native SA-IS forward
    # (csrc/bz3n.cpp bz3n_bwt_forward) and the quad-merge inverse —
    # while the CM stage stays on DEVICE: resumable encode with a
    # CAPPED output buffer (the worst-case i32 staging alone would be
    # 18 GiB at 511 MiB) and the chunked-output stream decode
    # (cm_decode_pallas_stream).  RLE/LZP/CRC are the standard host
    # passes.  Host prep of block i+1 overlaps device CM of block i
    # through a single worker thread (the ctypes SA-IS call releases
    # the GIL).  Priced in docs/design_round5.md §3(b).

    def _oversize_prep(self, data):
        """Host half of oversize encode: CRC + RLE/LZP gating + SA-IS."""
        try:
            from .ops.native import bwt_forward as host_bwt_forward
        except Exception:  # pragma: no cover - toolchain-less
            from .ops.ref.bwt import bwt_forward as host_bwt_forward

        crc = int(_host_crc32(data))
        if len(data) < SMALL_BLOCK_THRESHOLD:
            return crc, None
        model, lzp_size, rle_size, cur = 0, -1, -1, data
        if self.use_rle:
            r = rle_encode(cur)
            if len(r) < len(cur):
                cur, rle_size, model = r, len(r), model | 4
        if self.use_lzp:
            l = lzp_encode(cur)
            if l is not None and len(l) < len(cur):
                cur, lzp_size, model = l, len(l), model | 2
        u, idx = host_bwt_forward(cur)
        return crc, (model, lzp_size, rle_size, len(cur), u, idx)

    def _native_fallback_encode(self, data):
        """Exact re-encode of one block when the capped device payload
        overflows (e.g. incompressible data at a small cap fraction)."""
        try:
            from .ops.native import NativeCodec

            return NativeCodec(self.block_size).encode_block(data)
        except Exception:  # pragma: no cover - toolchain-less
            from .models.block_codec import encode_block

            return encode_block(data)

    def _encode_blocks_oversize(self, blocks: list[bytes]) -> list[bytes]:
        from concurrent.futures import ThreadPoolExecutor

        t = self.timer
        out = []
        with ThreadPoolExecutor(1) as ex:
            nxt = ex.submit(self._oversize_prep, blocks[0]) if blocks else None
            for i, data in enumerate(blocks):
                with t.stage("encode/host_prepass"):
                    crc, meta = nxt.result()
                if i + 1 < len(blocks):
                    nxt = ex.submit(self._oversize_prep, blocks[i + 1])
                if meta is None:  # literal path (< 64 bytes)
                    out.append(
                        _U32.pack(crc & 0xFFFFFFFF) + _S32.pack(-1) + data
                    )
                    continue
                model, lzp_size, rle_size, sbb, u, idx = meta
                # Capped payload width: full bound()-sized staging is
                # 8 padded lanes x i32 = up to 18 GiB; real post-BWT CM
                # ratios sit well under the cap fraction, and an
                # overflow row is re-encoded natively (never emitted
                # corrupt).
                frac = float(os.environ.get("BZ3_TPU_OVERSIZE_OUT_FRAC", "0.4"))
                cap = _round_up(max(1 << 20, int(sbb * frac)) + 4096, 1024)
                with t.stage("encode/dispatch"):
                    u_arr = jnp.asarray(
                        np.frombuffer(u, np.uint8)[None, :]
                    )
                    lens = jnp.asarray(np.array([sbb], np.int32))
                    if _cm_impl() == "pallas":
                        from .ops.device.cm_pallas import (
                            cm_encode_pallas_batch,
                        )

                        payload, plens = cm_encode_pallas_batch(
                            u_arr, lens, out_width=cap, lanes=8
                        )
                    else:  # CPU test lane: XLA scan, uncapped
                        payload, plens = cm_encode_batch(u_arr, lens)
                with t.stage("encode/sync_meta"):
                    plen = int(np.asarray(plens)[0])
                # pallas sizes the buffer exactly at the cap; the CPU
                # scan path is full-width — either way overflow means
                # "payload larger than the buffer that was written"
                if plen > payload.shape[1]:
                    out.append(self._native_fallback_encode(data))
                    continue
                with t.stage("encode/d2h_payload"):
                    pay = np.asarray(_start_d2h(payload[0, :plen]))
                with t.stage("encode/assemble"):
                    hdr = bytearray(
                        _U32.pack(crc & 0xFFFFFFFF) + _S32.pack(int(idx))
                    )
                    hdr.append(model)
                    if model & 2:
                        hdr += _S32.pack(lzp_size)
                    if model & 4:
                        hdr += _S32.pack(rle_size)
                    out.append(bytes(hdr) + pay.tobytes())
        return out

    def _decode_blocks_oversize(
        self, blocks: list[tuple[bytes, int]]
    ) -> list[bytes]:
        try:
            from .ops.native import bwt_inverse as host_bwt_inverse
        except Exception:  # pragma: no cover - toolchain-less
            from .ops.ref.bwt import bwt_inverse as _ref_inv

            def host_bwt_inverse(u, idx):
                return _ref_inv(u, idx)

        t = self.timer
        bnd = bound(self.block_size)
        finals = []
        for block, orig_size in blocks:
            if len(block) > bnd:
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
            hdr = parse_block_header(block)
            if hdr.is_literal:
                data = block[8:]
                if len(data) > 64:
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
                if int(_host_crc32(data)) != hdr.crc32:
                    raise Bz3Error(BZ3_ERR_CRC)
                finals.append(data)
                continue
            if (hdr.model & 2 and not (0 <= hdr.lzp_size <= bnd)) or (
                hdr.model & 4 and not (0 <= hdr.rle_size <= bnd)
            ):
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
            if orig_size > bnd or orig_size < 0:
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
            if hdr.model & 2:
                sbb = hdr.lzp_size
            elif hdr.model & 4:
                sbb = hdr.rle_size
            else:
                sbb = orig_size
            if hdr.bwt_idx > sbb or sbb > self.width:
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
            payload = block[hdr.header_size() :]
            with t.stage("decode/pad_h2d"):
                pay_arr = jnp.asarray(
                    np.frombuffer(payload, np.uint8)[None, :]
                )
                plen = jnp.asarray(np.array([len(payload)], np.int32))
                sbb_a = jnp.asarray(np.array([sbb], np.int32))
            with t.stage("decode/dispatch"):
                if _cm_impl() == "pallas":
                    from .ops.device.cm_pallas import (
                        cm_decode_pallas_stream,
                    )

                    # chunked stream: pull piece j while j+1 computes
                    pieces = []
                    pending = None
                    for _s, chunk in cm_decode_pallas_stream(
                        pay_arr, plen, sbb_a, sbb, lanes=8
                    ):
                        _start_d2h(chunk)
                        if pending is not None:
                            pieces.append(np.asarray(pending))
                        pending = chunk
                    if pending is not None:
                        pieces.append(np.asarray(pending))
                    u = np.concatenate(pieces, axis=1)[0, :sbb]
                else:  # CPU test lane: XLA scan
                    ow = _round_up(max(256, sbb), 256)
                    u = np.asarray(
                        cm_decode_batch(pay_arr, plen, sbb_a, ow)
                    )[0, :sbb]
            with t.stage("decode/host_post"):
                cur = host_bwt_inverse(u.tobytes(), hdr.bwt_idx)
                if cur is None:
                    raise Bz3Error(BZ3_ERR_BWT)
                if hdr.model & 2:
                    cur = lzp_decode(cur, bnd)
                    if cur is None:
                        raise Bz3Error(BZ3_ERR_CRC)
                if hdr.model & 4:
                    cur = rle_decode(cur, orig_size)
                    if cur is None:
                        raise Bz3Error(BZ3_ERR_CRC)
                if len(cur) > self.block_size:
                    raise Bz3Error(BZ3_ERR_MALFORMED_HEADER)
            with t.stage("decode/crc_verify"):
                if int(_host_crc32(cur)) != hdr.crc32:
                    raise Bz3Error(BZ3_ERR_CRC)
            finals.append(cur)
        return finals
