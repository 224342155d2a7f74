"""Native (C++) runtime vs oracle — bit parity and batch APIs."""

import os
import shutil

import numpy as np
import pytest

from bzip3_tpu.models.block_codec import encode_block, decode_block
from bzip3_tpu.ops.ref.crc32 import crc32 as ref_crc

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)

RNG = np.random.default_rng(11)
BS = 131072


@pytest.fixture(scope="module")
def native():
    from bzip3_tpu.ops import native as m

    m._load()
    return m


@pytest.fixture(scope="module")
def cases(text_data):
    return [
        b"",
        b"x" * 40,
        b"banana" * 200,
        bytes(RNG.integers(0, 256, 70000, dtype=np.uint8)),
        b"\x00" * 70000,
        text_data[:65536],
        (text_data * 4)[:120000],
    ]


def test_native_crc_parity(native, cases):
    for c in cases:
        assert native.crc32(c) == ref_crc(c)


def test_native_block_parity(native, cases):
    codec = native.NativeCodec(BS)
    for i, c in enumerate(cases):
        e_native = codec.encode_block(c)
        e_oracle = encode_block(c)
        assert e_native == e_oracle, i
        assert codec.decode_block(e_native, len(c)) == c, i
        assert decode_block(e_native, len(c), BS) == c, i
        assert codec.decode_block(e_oracle, len(c)) == c, i


def test_native_batch_apis(native, cases):
    codec = native.NativeCodec(BS)
    enc = native.encode_blocks(list(cases))
    assert enc == [codec.encode_block(c) for c in cases]
    dec = native.decode_blocks([(e, len(c)) for e, c in zip(enc, cases)], BS)
    assert dec == list(cases)


def test_native_rejects_corruption(native, cases):
    from bzip3_tpu.errors import Bz3Error

    codec = native.NativeCodec(BS)
    e = bytearray(codec.encode_block(cases[5]))
    e[len(e) // 2] ^= 0xFF
    with pytest.raises(Bz3Error):
        codec.decode_block(bytes(e), len(cases[5]))


def test_engine_registry(native, cases):
    from bzip3_tpu.engines import get_engine

    eng = get_engine("native")
    oracle = get_engine("oracle")
    enc_n = eng.encode_blocks(list(cases), BS)
    enc_o = oracle.encode_blocks(list(cases), BS)
    assert enc_n == enc_o
    assert eng.decode_blocks([(e, len(c)) for e, c in zip(enc_n, cases)], BS) == list(
        cases
    )


def test_big_block_u64_inverse_path(native):
    """Blocks past 2^24 bytes use the u64 packed-node inverse-BWT path;
    round-trip an incompressible 17 MiB block through it."""
    n = (1 << 24) + 4097
    src = np.random.default_rng(41).integers(0, 256, n, dtype=np.uint8).tobytes()
    codec = native.NativeCodec(n)
    enc = codec.encode_block(src)
    assert codec.decode_block(enc, n) == src


@pytest.mark.slow
def test_big_block_64mib_cli_roundtrip(native, tmp_path):
    """Big-block capability proof (-b 64 end-to-end through the CLI
    with the native batch engine): a 64 MiB block exercises the u64
    inverse-BWT path well past 2^24 (reference block ceiling is 511 MiB,
    src/libbz3.c:536; the format path is identical from 2^24 up)."""
    import subprocess
    import sys

    rng = np.random.default_rng(99)
    # compressible-but-structured data so the full stage stack engages
    words = [rng.integers(97, 123, rng.integers(3, 9), dtype=np.uint8).tobytes() for _ in range(512)]
    parts = []
    total = 0
    while total < (64 << 20):
        w = words[int(rng.integers(0, 512))]
        parts.append(w + b" ")
        total += len(w) + 1
    src = b"".join(parts)[: 64 << 20]
    p_in = tmp_path / "big.bin"
    p_in.write_bytes(src)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "-m", "bzip3_tpu", "-e", "-b", "64", "--engine", "native",
         str(p_in)],
        check=True, env=env,
    )
    out = tmp_path / "big.bin.out"
    subprocess.run(
        [sys.executable, "-m", "bzip3_tpu", "-d", "-c", "--engine", "native",
         str(p_in) + ".bz3"],
        check=True, env=env, stdout=out.open("wb"),
    )
    assert out.read_bytes() == src


@pytest.mark.slow
def test_block_size_511_accepted_end_to_end(native, tmp_path):
    """-b 511 (the format's maximum block size) must be usable end to
    end; the input is smaller than the block, exercising the single
    jumbo-block framing path."""
    import io

    from bzip3_tpu.container.stream import compress_file, decompress_file
    from bzip3_tpu.engines import get_engine

    src = (b"the maximum block size is five hundred eleven mebibytes " * 40000)
    eng = get_engine("native")
    buf = io.BytesIO()
    compress_file(
        io.BytesIO(src), buf, block_size=511 * 1024 * 1024,
        batch_encode=lambda blocks: eng.encode_blocks(blocks, 511 * 1024 * 1024),
    )
    out = io.BytesIO()
    decompress_file(
        io.BytesIO(buf.getvalue()), out,
        batch_decode=lambda pairs, bs: eng.decode_blocks(pairs, bs),
    )
    assert out.getvalue() == src


def test_quad_merge_u32_region_roundtrip(native):
    """Blocks in [2^18, 2^24) take the u32 packed-node QUAD-merge walk;
    none of the other suite sizes land in that region (they are either
    below the quad gate or on the u64 path), so pin it explicitly."""
    rng = np.random.default_rng(77)
    for n in ((1 << 18) + 11, (1 << 20) + 3, (3 << 20)):
        base = rng.integers(97, 123, n, dtype=np.uint8)
        rep = rng.random(n) < 0.5
        base[1:][rep[1:]] = base[:-1][rep[1:]]
        src = base.tobytes()
        codec = native.NativeCodec(n)
        enc = codec.encode_block(src)
        assert codec.decode_block(enc, n) == src, n


def test_paired_interleaved_decode_parity(native):
    """When jobs >= 2x threads the pool decodes PAIRS of blocks with
    their CM streams software-interleaved (ILP within a core); the
    output must be bit-identical to the serial path for every pairing
    arity, including the odd-leftover and literal-block fallbacks."""
    rng = np.random.default_rng(123)
    blocks = [
        bytes(rng.integers(97, 123, 70000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 80001, dtype=np.uint8)),
        b"run" * 30000,
        b"tiny",  # literal block: pair fallback path
        bytes(rng.integers(0, 16, 66000, dtype=np.uint8)),
    ]
    bs = 1 << 17
    enc = native.encode_blocks(blocks, 0)
    pairs = [(e, len(b)) for e, b in zip(enc, blocks)]
    serial = native.decode_blocks(pairs, bs, len(blocks))  # 1 thread/job
    for nt in (1, 2):  # forces pairing (5 jobs >= 2*nt)
        assert native.decode_blocks(pairs, bs, nt) == serial == blocks


def test_paired_interleaved_encode_parity(native):
    """Paired encode (CM streams interleaved) must be byte-identical to
    the serial path, including literal-block fallbacks."""
    rng = np.random.default_rng(321)
    blocks = [
        bytes(rng.integers(97, 123, 70000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 80001, dtype=np.uint8)),
        b"run" * 30000,
        b"tiny",
        bytes(rng.integers(0, 16, 66000, dtype=np.uint8)),
    ]
    serial = native.encode_blocks(blocks, len(blocks))  # 1 thread/job
    for nt in (1, 2):
        assert native.encode_blocks(blocks, nt) == serial


@pytest.mark.slow
def test_jumbo_block_past_quad_cap_roundtrip(native):
    """A single block larger than 2^26 bytes exercises the plain u64
    LF-walk branch of the inverse BWT (the pair/quad side arrays cap at
    64 MiB blocks) and the raw-u8 SA-IS at >100M positions — the
    512 MiB-class capability proof (reference ceiling 511 MiB,
    src/libbz3.c:536).  96 MiB of low-entropy data keeps runtime sane."""
    rng = np.random.default_rng(7)
    n = 96 << 20
    # run-heavy structured bytes: RLE shrinks it a bit, LZP engages,
    # and the post-filter payload stays comfortably past 2^26
    raw = rng.integers(32, 64, n, dtype=np.uint8)
    runs = rng.random(n) < 0.6
    raw[1:][runs[1:]] = raw[:-1][runs[1:]]
    src = raw.tobytes()
    enc = native.encode_blocks([src], 0)[0]
    dec = native.decode_blocks([(enc, n)], n, 0)[0]
    assert bytes(dec) == src


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("BZ3_HEAVY"),
    reason="~10 min, 6+ GB: the 511 MiB ceiling proof; set BZ3_HEAVY=1",
)
def test_reference_max_block_roundtrip(native):
    """The reference's hard block-size ceiling is 511 MiB
    (src/libbz3.c:536).  One block at exactly that size through the
    native codec proves the framework accepts the format's largest
    legal block: SA-IS at ~5.3e8 positions (just under its s32 n<2^29
    bound) and the u64 inverse-BWT walk at the same scale.  Run-heavy
    data keeps the CM stage's share of the runtime sane."""
    n = 511 << 20
    rng = np.random.default_rng(13)
    raw = rng.integers(40, 56, n, dtype=np.uint8)
    runs = rng.random(n) < 0.85
    raw[1:][runs[1:]] = raw[:-1][runs[1:]]
    src = raw.tobytes()
    del raw, runs
    enc = native.encode_blocks([src], 0)[0]
    dec = native.decode_blocks([(enc, n)], n, 0)[0]
    assert bytes(dec) == src
