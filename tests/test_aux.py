"""Auxiliary subsystems: LCP arrays, profiling utils, recover mode."""

import io

import numpy as np

from bzip3_tpu.ops.ref.bwt import suffix_array
from bzip3_tpu.ops.ref.lcp import plcp_array, lcp_array
from bzip3_tpu.utils.profiling import StageTimer


def _naive_lcp(a: bytes, b: bytes) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_lcp_arrays_match_naive(text_data):
    data = text_data[:400]
    sa = suffix_array(np.frombuffer(data, dtype=np.uint8))
    lcp = lcp_array(data, sa)
    for r in range(1, len(data)):
        want = _naive_lcp(data[sa[r] :], data[sa[r - 1] :])
        assert int(lcp[r]) == want, r
    plcp = plcp_array(data, np.asarray(sa))
    for r in range(1, len(data)):
        assert int(plcp[sa[r]]) == int(lcp[r])


def test_stage_timer():
    t = StageTimer(enabled=True)
    with t.stage("x"):
        pass
    with t.stage("x"):
        pass
    assert t.counts["x"] == 2
    assert "x" in t.summary()


def test_recover_mode_emits_best_effort(text_data):
    import bzip3_tpu
    from bzip3_tpu.container.stream import compress_file, recover_file

    src = text_data[:300000]
    buf = io.BytesIO()
    compress_file(io.BytesIO(src), buf, block_size=66560)
    blob = bytearray(buf.getvalue())
    # corrupt one byte inside the second block's payload
    blob[len(blob) // 2] ^= 0xFF
    out = io.BytesIO()
    recover_file(io.BytesIO(bytes(blob)), out)
    got = out.getvalue()
    assert len(got) == len(src)
    # most blocks survive; the corrupted one is best-effort
    assert got[:66560] == src[:66560] or got[-66560:] == src[-66560:]


def test_recover_mode_partial_bytes_on_crc_corruption(text_data):
    """A block whose stored CRC is corrupted (payload intact) decodes
    fully; recover mode must emit those exact bytes, not zero fill —
    the reference writes the decoded buffer as-is (src/main.c:293-296)."""
    import io as _io
    from bzip3_tpu.container.stream import compress_file, recover_file

    src = text_data[:200000]
    buf = _io.BytesIO()
    compress_file(_io.BytesIO(src), buf, block_size=66560)
    blob = bytearray(buf.getvalue())
    # Block 1 starts after the 9-byte file header; its chunk header is
    # 8 bytes, then the block header begins with the stored CRC32.
    blob[9 + 8] ^= 0xFF
    out = _io.BytesIO()
    recover_file(_io.BytesIO(bytes(blob)), out)
    got = out.getvalue()
    assert len(got) == len(src)
    assert got == src  # every byte recovered despite the bad CRC field


def test_recover_mode_uses_fast_engine(text_data):
    """Recover mode must route healthy blocks through the configured
    batch engine (not the oracle) — and still emit best-effort bytes
    for the broken one."""
    import io as _io
    from bzip3_tpu.container.stream import compress_file, decompress_file

    src = text_data[:200000]
    buf = _io.BytesIO()
    compress_file(_io.BytesIO(src), buf, block_size=66560)
    blob = bytearray(buf.getvalue())
    blob[9 + 8] ^= 0xFF  # corrupt block 0's stored CRC

    calls = {"batch": 0, "singles": 0}

    def batch_decode(pairs, bs):
        from bzip3_tpu.models.block_codec import decode_block

        if len(pairs) > 1:
            calls["batch"] += 1
        else:
            calls["singles"] += 1
        return [decode_block(p, o, bs) for p, o in pairs]

    out = _io.BytesIO()
    decompress_file(
        _io.BytesIO(bytes(blob)),
        out,
        recover=True,
        batch_decode=batch_decode,
        batch_size=8,
    )
    assert out.getvalue() == src
    assert calls["batch"] >= 1  # engine was used for the batch attempt
    assert calls["singles"] >= 1  # per-block retry path engaged
