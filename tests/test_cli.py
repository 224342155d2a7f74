"""CLI surface tests (bzip3 flag parity, file handling, modes)."""

import io
import os
import subprocess
import sys

import pytest

from bzip3_tpu.cli import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin: bytes = b""):
    r = subprocess.run(
        [sys.executable, "-m", "bzip3_tpu"] + args,
        input=stdin,
        capture_output=True,
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    return r


@pytest.fixture(scope="module")
def sample(tmp_path_factory, text_data):
    p = tmp_path_factory.mktemp("cli") / "sample.txt"
    p.write_bytes(text_data[:100000])
    return p


def test_encode_decode_files(sample, tmp_path):
    out = run_cli(["-e", "-b", "1", str(sample), str(tmp_path / "s.bz3")])
    assert out.returncode == 0, out.stderr
    out = run_cli(["-d", str(tmp_path / "s.bz3"), str(tmp_path / "s.txt")])
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "s.txt").read_bytes() == sample.read_bytes()


def test_stdin_stdout_round_trip(sample):
    data = sample.read_bytes()
    enc = run_cli(["-e", "-b", "1", "-c"], stdin=data)
    assert enc.returncode == 0, enc.stderr
    dec = run_cli(["-d", "-c"], stdin=enc.stdout)
    assert dec.returncode == 0, dec.stderr
    assert dec.stdout == data


def test_test_mode_and_corruption(sample, tmp_path):
    enc = run_cli(["-e", "-b", "1", "-c"], stdin=sample.read_bytes())
    p = tmp_path / "x.bz3"
    p.write_bytes(enc.stdout)
    assert run_cli(["-t", str(p)]).returncode == 0
    bad = bytearray(enc.stdout)
    bad[len(bad) // 2] ^= 0xFF
    p.write_bytes(bytes(bad))
    assert run_cli(["-t", str(p)]).returncode != 0


def test_default_suffix(sample, tmp_path):
    src = tmp_path / "f.txt"
    src.write_bytes(sample.read_bytes())
    assert run_cli(["-e", "-b", "1", str(src)]).returncode == 0
    assert (tmp_path / "f.txt.bz3").exists()
    os.unlink(src)
    assert run_cli(["-d", str(tmp_path / "f.txt.bz3")]).returncode == 0
    assert (tmp_path / "f.txt").read_bytes() == sample.read_bytes()


def test_force_overwrite(sample, tmp_path):
    tgt = tmp_path / "o.bz3"
    tgt.write_bytes(b"junk")
    r = run_cli(["-e", "-b", "1", str(sample), str(tgt)])
    assert r.returncode != 0  # refuses without -f
    r = run_cli(["-e", "-b", "1", "-f", str(sample), str(tgt)])
    assert r.returncode == 0


def test_batch_mode(sample, tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_bytes(b"hello a " * 1000)
    b.write_bytes(b"hello b " * 1000)
    assert run_cli(["-e", "-b", "1", "-B", str(a), str(b)]).returncode == 0
    assert (tmp_path / "a.txt.bz3").exists() and (tmp_path / "b.txt.bz3").exists()


def test_version_and_help():
    assert b"bzip3" in run_cli(["-V"]).stdout
    assert b"Usage" in run_cli(["-h"]).stdout


def test_oracle_engine_flag(sample):
    data = sample.read_bytes()[:70000]
    a = run_cli(["-e", "-b", "1", "-c", "--engine", "oracle"], stdin=data)
    b = run_cli(["-e", "-b", "1", "-c", "--engine", "auto"], stdin=data)
    assert a.returncode == 0 and b.returncode == 0
    assert a.stdout == b.stdout


def test_recover_mode_cli(sample, tmp_path):
    enc = run_cli(["-e", "-b", "1", "-c"], stdin=sample.read_bytes())
    bad = bytearray(enc.stdout)
    bad[len(bad) // 2] ^= 0xFF  # corrupt one payload byte
    p = tmp_path / "r.bz3"
    p.write_bytes(bytes(bad))
    # plain decode fails, recover succeeds with best-effort output
    assert run_cli(["-d", "-c", str(p)]).returncode != 0
    r = run_cli(["-r", "-c", str(p)])
    assert r.returncode == 0
    assert len(r.stdout) == len(sample.read_bytes())


def test_jobs_flag_batched_identical(sample):
    data = sample.read_bytes()
    a = run_cli(["-e", "-b", "1", "-c", "-j", "4"], stdin=data)
    b = run_cli(["-e", "-b", "1", "-c", "-j", "1"], stdin=data)
    assert a.returncode == 0 and a.stdout == b.stdout
    d = run_cli(["-d", "-c", "-j", "4"], stdin=a.stdout)
    assert d.stdout == data
