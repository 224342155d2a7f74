"""Batched block pipeline — the high-throughput device path.

The block is the unit of data parallelism (as in the reference's
bz3_encode_blocks pthread fan-out, src/libbz3.c:845-870).  A batch of K
blocks is padded into fixed [K, N] arrays and runs:

  encode:  crc32_batch ∥ (host RLE/LZP pre-pass) → bwt_forward_batch
           → cm_encode_batch                        (one jitted program)
  decode:  cm_decode_batch → bwt_inverse_batch      (one jitted program)
           → host un-LZP/un-RLE → crc32_batch verify

Host pre/post passes handle the byte-serial dictionary stages until
their Pallas kernels land; everything O(n log n) or state-heavy runs on
device.  Multi-chip scaling shards the K axis over a mesh — see
bzip3_tpu.parallel.sharding.
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

_U32 = struct.Struct("<I")
_S32 = struct.Struct("<i")


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


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
    crc = crc32_batch(orig, orig_lens)
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
    data = bwt_inverse_batch(u, sbb_lens, bwt_idx)
    return data


def _pad_batch(chunks: list[bytes], width: int):
    k = len(chunks)
    arr = np.zeros((k, width), dtype=np.uint8)
    lens = np.zeros(k, dtype=np.int32)
    for i, c in enumerate(chunks):
        arr[i, : len(c)] = np.frombuffer(c, dtype=np.uint8)
        lens[i] = len(c)
    return jnp.asarray(arr), jnp.asarray(lens)


class DevicePipeline:
    """Batched encoder/decoder bound to one block size.

    ``encode_core_fn`` / ``decode_core_fn`` may be overridden with
    sharded versions (see parallel.sharding.sharded_pipeline) — the
    host-side framing is identical.
    """

    def __init__(self, block_size: int, use_rle: bool = True, use_lzp: bool = True):
        self.block_size = block_size
        self.width = _round_up(max(64, block_size), 256)
        self.use_rle = use_rle
        self.use_lzp = use_lzp
        self.encode_core_fn = encode_core
        self.decode_core_fn = decode_core

    # -- encode ---------------------------------------------------------

    def encode_blocks(self, blocks: list[bytes]) -> list[bytes]:
        """Encode a batch of blocks into BZ3v1 block bytes (hdr+payload)."""
        metas = []  # (model, lzp_size, rle_size, cur)
        for data in blocks:
            if len(data) > self.block_size:
                raise Bz3Error(BZ3_ERR_MALFORMED_HEADER, "block exceeds block size")
            model, lzp_size, rle_size, cur = 0, -1, -1, data
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

        orig_arr, orig_lens = _pad_batch(blocks, self.width)
        cur_arr, cur_lens = _pad_batch([m[3] for m in metas], self.width)
        crc, idx, payload, plens, ok = self.encode_core_fn(
            orig_arr, orig_lens, cur_arr, cur_lens
        )
        crc = np.asarray(crc)
        idx = np.asarray(idx)
        plens = np.asarray(plens)
        ok = np.asarray(ok)
        # Device->host through the accelerator tunnel runs ~15 MB/s
        # (measured; H2D is ~400), so never pull the padded payload
        # width: slice to the longest real payload on device first
        # (compressed payloads are ~ratio * W, a 5-6x transfer cut).
        max_len = min(int(plens.max(initial=0)), payload.shape[1])
        payload = np.asarray(payload[:, :max_len])

        out = []
        for i, data in enumerate(blocks):
            model, lzp_size, rle_size, _ = metas[i]
            if len(data) < SMALL_BLOCK_THRESHOLD:
                out.append(_U32.pack(int(crc[i])) + _S32.pack(-1) + data)
                continue
            if not bool(ok[i]):
                # cm_parallel certification failure / emission overflow,
                # or a payload exceeding the padded width: re-encode this
                # block through the exact serial path (ops.ref) — slow,
                # guaranteed, and byte-identical by the cross-engine
                # parity contract (never silently emit a corrupt stream).
                from .models.block_codec import encode_block

                out.append(encode_block(data))
                continue
            hdr = bytearray(_U32.pack(int(crc[i])) + _S32.pack(int(idx[i])))
            hdr.append(model)
            if model & 2:
                hdr += _S32.pack(lzp_size)
            if model & 4:
                hdr += _S32.pack(rle_size)
            out.append(bytes(hdr) + payload[i, : plens[i]].tobytes())
        return out

    # -- decode ---------------------------------------------------------

    def decode_blocks(self, blocks: list[tuple[bytes, int]]) -> list[bytes]:
        """Decode a batch of (block_bytes, orig_size) pairs.

        Mirrors every hardening check of bz3_decode_block
        (src/libbz3.c:656-809) via models.block_codec.parse_block_header
        plus the bound checks below.
        """
        bnd = bound(self.block_size)
        headers = []
        payloads = []
        sbbs = []
        idxs = []
        literal = {}
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

        # Bucket the payload width (power of two) to bound recompiles.
        pw = 64
        while pw < max(map(len, payloads), default=1):
            pw <<= 1
        pay_arr, pay_lens = _pad_batch(payloads, pw)
        data = self.decode_core_fn(
            pay_arr,
            pay_lens,
            jnp.asarray(np.array(sbbs, np.int32)),
            jnp.asarray(np.array(idxs, np.int32)),
            self.width,
        )
        # Same slow-D2H mitigation as encode: rows only hold sbb bytes
        # (the post-LZP/RLE size, typically well under the block width).
        data = np.asarray(data[:, : max(sbbs, default=0)])

        finals = []
        for i, (block, orig_size) in enumerate(blocks):
            if i in literal:
                d, want = literal[i]
                finals.append(d)
                continue
            hdr = headers[i]
            cur = data[i, : sbbs[i]].tobytes()
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
            finals.append(cur)

        # Batched CRC verify of every decoded block (incl. literals).
        f_arr, f_lens = _pad_batch(finals, self.width)
        crcs = np.asarray(crc32_batch(f_arr, f_lens))
        for i, (block, _) in enumerate(blocks):
            want = literal[i][1] if i in literal else headers[i].crc32
            if int(crcs[i]) != want:
                raise Bz3Error(BZ3_ERR_CRC)
        return finals
