"""Native (C++) host runtime bindings.

Loads csrc/bz3n.cpp (compiled on demand to _build/libbz3n.so) via
ctypes and exposes:

- the scalar engine API (crc32, rle/lzp/bwt/cm encode+decode is fused
  inside the native block codec, so the scalar API here is the block
  level: encode_block / decode_block), and
- the batched pthread APIs encode_blocks / decode_blocks, mirroring
  bz3_encode_blocks / bz3_decode_blocks (reference: src/libbz3.c:845).

The native runtime serves the byte-serial stages (CM, LZP) that do not
map onto TPU vector lanes; the TPU engine (ops.device) owns the
array-parallel stages.  Both produce bit-identical BZ3v1 streams.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(_HERE)))
_SRC = os.path.join(_ROOT, "csrc", "bz3n.cpp")
_BUILD_DIR = os.path.join(_ROOT, "_build")
_SO = os.path.join(_BUILD_DIR, "libbz3n.so")

_lock = threading.Lock()
_lib = None


def _compile():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-march=native",
        "-fPIC",
        "-shared",
        "-pthread",
        _SRC,
        "-o",
        _SO + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


# Installed-package location (built by setup.py's build_py hook).
_PKG_SO = os.path.join(
    os.path.dirname(os.path.dirname(_HERE)), "_native_lib", "libbz3n.so"
)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if os.path.exists(_SRC):
            # source checkout: (re)build on demand
            need = not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            )
            if need:
                _compile()
            so_path = _SO
        elif os.path.exists(_PKG_SO):
            # installed wheel: use the library shipped by setup.py
            so_path = _PKG_SO
        else:
            raise OSError("libbz3n.so not found and no csrc to build it from")
        lib = ctypes.CDLL(so_path)
        lib.bz3n_crc32.restype = ctypes.c_uint32
        lib.bz3n_crc32.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.bz3n_bound.restype = ctypes.c_int32
        lib.bz3n_new_workspace.restype = ctypes.c_void_p
        lib.bz3n_free_workspace.argtypes = [ctypes.c_void_p]
        lib.bz3n_encode_block.restype = ctypes.c_int32
        lib.bz3n_encode_block.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.bz3n_decode_block.restype = ctypes.c_int32
        lib.bz3n_decode_block.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        _pp = ctypes.POINTER(ctypes.c_char_p)
        _pi = ctypes.POINTER(ctypes.c_int32)
        _ppu = ctypes.POINTER(ctypes.c_void_p)
        lib.bz3n_encode_blocks.argtypes = [_pp, _pi, _ppu, _pi, ctypes.c_int32, ctypes.c_int32]
        lib.bz3n_decode_blocks.argtypes = [
            _pp, _pi, _pi, ctypes.c_int32, _ppu, _pi, ctypes.c_int32, ctypes.c_int32,
        ]
        _lib = lib
        return lib


def bound(n: int) -> int:
    return n + n // 50 + 32


def crc32(data, crc: int = 1) -> int:
    if crc != 1:
        raise NotImplementedError("native crc32 only supports init=1")
    lib = _load()
    b = bytes(data)
    return lib.bz3n_crc32(b, len(b))


class NativeCodec:
    """Reusable native block codec (cf. bz3_state, src/libbz3.c:498)."""

    def __init__(self, block_size: int):
        self.block_size = block_size
        self._lib = _load()
        self._ws = self._lib.bz3n_new_workspace()

    def __del__(self):
        try:
            self._lib.bz3n_free_workspace(self._ws)
        except Exception:
            pass

    def encode_block(self, data: bytes) -> bytes:
        out = ctypes.create_string_buffer(bound(len(data)) + 64)
        r = self._lib.bz3n_encode_block(self._ws, data, len(data), out)
        if r < 0:
            raise RuntimeError(f"native encode failed: {r}")
        return out.raw[:r]

    def decode_block(self, block: bytes, orig_size: int) -> bytes:
        out = ctypes.create_string_buffer(bound(self.block_size) + 64)
        r = self._lib.bz3n_decode_block(
            self._ws, block, len(block), orig_size, self.block_size, out
        )
        if r < 0:
            from ...errors import Bz3Error, BZ3_ERR_CRC, BZ3_ERR_MALFORMED_HEADER, \
                BZ3_ERR_BWT, BZ3_ERR_DATA_SIZE_TOO_SMALL
            code = {
                -1: BZ3_ERR_BWT,
                -2: BZ3_ERR_MALFORMED_HEADER,
                -3: BZ3_ERR_CRC,
                -5: BZ3_ERR_DATA_SIZE_TOO_SMALL,
            }.get(r, BZ3_ERR_MALFORMED_HEADER)
            raise Bz3Error(code, f"native decode failed: {r}")
        return out.raw[:r]


def encode_blocks(blocks: list[bytes], n_threads: int = 0) -> list[bytes]:
    """Parallel batch encode (pthread fan-out in native code)."""
    lib = _load()
    n = len(blocks)
    if n == 0:
        return []
    ins = (ctypes.c_char_p * n)(*blocks)
    lens = (ctypes.c_int32 * n)(*[len(b) for b in blocks])
    outs_bufs = [ctypes.create_string_buffer(bound(len(b)) + 64) for b in blocks]
    outs = (ctypes.c_void_p * n)(*[ctypes.addressof(o) for o in outs_bufs])
    results = (ctypes.c_int32 * n)()
    lib.bz3n_encode_blocks(ins, lens, outs, results, n, n_threads)
    out = []
    for i in range(n):
        r = results[i]
        if r < 0:
            raise RuntimeError(f"native batch encode failed at {i}: {r}")
        out.append(outs_bufs[i].raw[:r])
    return out


def decode_blocks(
    blocks: list[tuple[bytes, int]], block_size: int, n_threads: int = 0
) -> list[bytes]:
    """Parallel batch decode of (block_bytes, orig_size) pairs."""
    lib = _load()
    n = len(blocks)
    if n == 0:
        return []
    payloads = [b for b, _ in blocks]
    ins = (ctypes.c_char_p * n)(*payloads)
    in_lens = (ctypes.c_int32 * n)(*[len(b) for b in payloads])
    orig_sizes = (ctypes.c_int32 * n)(*[o for _, o in blocks])
    outs_bufs = [
        ctypes.create_string_buffer(bound(block_size) + 64) for _ in blocks
    ]
    outs = (ctypes.c_void_p * n)(*[ctypes.addressof(o) for o in outs_bufs])
    results = (ctypes.c_int32 * n)()
    lib.bz3n_decode_blocks(
        ins, in_lens, orig_sizes, block_size, outs, results, n, n_threads
    )
    out = []
    for i in range(n):
        r = results[i]
        if r < 0:
            from ...errors import Bz3Error, BZ3_ERR_CRC, BZ3_ERR_MALFORMED_HEADER
            raise Bz3Error(
                BZ3_ERR_CRC if r == -3 else BZ3_ERR_MALFORMED_HEADER,
                f"native batch decode failed at {i}: {r}",
            )
        out.append(outs_bufs[i].raw[:r])
    return out


# ---------------------------------------------------------- stage API

def _stage_lib():
    lib = _load()
    if not hasattr(lib, "_stage_ready"):
        lib.bz3n_lzp_encode.restype = ctypes.c_int32
        lib.bz3n_lzp_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bz3n_lzp_decode.restype = ctypes.c_int32
        lib.bz3n_lzp_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.bz3n_rle_encode.restype = ctypes.c_int32
        lib.bz3n_rle_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.bz3n_rle_decode.restype = ctypes.c_int32
        lib.bz3n_rle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib._stage_ready = True
    return lib


_LZP_LUT = None


def _lzp_lut():
    global _LZP_LUT
    if _LZP_LUT is None:
        _LZP_LUT = ctypes.create_string_buffer(4 << 18)
    return _LZP_LUT


def lzp_encode(data: bytes):
    """Native LZP pre-pass; None when not applicable (mirrors oracle)."""
    lib = _stage_lib()
    out = ctypes.create_string_buffer(max(64, len(data)))
    r = lib.bz3n_lzp_encode(data, len(data), out, _lzp_lut())
    return None if r < 0 else out.raw[:r]


def lzp_decode(data: bytes, max_out: int):
    lib = _stage_lib()
    out = ctypes.create_string_buffer(max(64, max_out))
    r = lib.bz3n_lzp_decode(data, len(data), out, max_out, _lzp_lut())
    return None if r < 0 else out.raw[:r]


def rle_encode(data: bytes) -> bytes:
    lib = _stage_lib()
    # mrlec output is bounded by 32 + 2n (worst case all gated singles)
    out = ctypes.create_string_buffer(2 * max(32, len(data)) + 64)
    r = lib.bz3n_rle_encode(data, len(data), out, len(out) - 1)
    if r < 0:
        # expanding beyond cap — return an over-length marker like the
        # device wrapper (callers only use RLE when it shrinks)
        return b"\x00" * (len(data) + 33)
    return out.raw[:r]


def rle_decode(data: bytes, out_len: int):
    lib = _stage_lib()
    out = ctypes.create_string_buffer(max(64, out_len))
    r = lib.bz3n_rle_decode(data, len(data), out, out_len)
    return None if r < 0 else out.raw[:r]


# ------------------------------------------------- host BWT (oversize)

def _bwt_lib():
    """BWT stage entry points (the host half of the oversize-block
    device hybrid, pipeline.py: blocks past the device HBM cap run
    SA-IS / the quad-merge inverse on the host with CM/LZP/RLE/CRC on
    device — the BWT is a clean stage boundary, reference analogue
    src/libbz3.c:623,758)."""
    import numpy as np  # noqa: F401 (kept local: numpy-free base API)

    lib = _load()
    if not hasattr(lib, "_bwt_ready"):
        lib.bz3n_bwt_forward.restype = ctypes.c_int32
        lib.bz3n_bwt_forward.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.bz3n_bwt_inverse_ex.restype = ctypes.c_int32
        lib.bz3n_bwt_inverse_ex.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib._bwt_ready = True
    return lib


def bwt_forward(data: bytes):
    """Native SA-IS BWT: returns (U bytes, primary index) with the
    libsais_bwt output contract (see ops/ref/bwt.py)."""
    import numpy as np

    n = len(data)
    if n <= 1:
        return data, n
    lib = _bwt_lib()
    out = np.empty(n, np.uint8)
    # forward scratch contract: >= 8n bytes (SA n+1 words + u8 temp)
    scratch = np.empty(2 * (n + 16) + 16, np.int32)
    idx = lib.bz3n_bwt_forward(
        data, out.ctypes.data_as(ctypes.c_void_p), n,
        scratch.ctypes.data_as(ctypes.c_void_p),
    )
    if idx < 0:
        raise RuntimeError("native bwt_forward failed")
    return out.tobytes(), int(idx)


def bwt_inverse(u: bytes, index: int):
    """Native inverse BWT (quad-merge LF walk); None on a bad index."""
    import numpy as np

    n = len(u)
    if n <= 1:
        return u if index == n else None
    if index <= 0 or index > n:
        return None
    lib = _bwt_lib()
    out = np.empty(n, np.uint8)
    words = 2 * (n + 16)
    scratch = np.empty(words + 16, np.int32)
    r = lib.bz3n_bwt_inverse_ex(
        u, out.ctypes.data_as(ctypes.c_void_p), n, index,
        scratch.ctypes.data_as(ctypes.c_void_p), words,
    )
    return None if r < 0 else out.tobytes()
