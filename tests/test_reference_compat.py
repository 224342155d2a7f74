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
