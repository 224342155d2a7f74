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
