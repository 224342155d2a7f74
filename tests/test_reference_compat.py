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
