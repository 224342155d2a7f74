"""Shell wrapper tests (SURVEY §2 L6: bunzip3/bz3cat/bz3grep...).

The wrappers shell out to `python -m bzip3_tpu`; run them with the
repo on PYTHONPATH.  Skipped where /bin/sh is unavailable.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")

pytestmark = pytest.mark.skipif(
    shutil.which("sh") is None, reason="no POSIX shell"
)


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # wrappers call plain `python`
    pydir = os.path.dirname(sys.executable)
    env["PATH"] = pydir + os.pathsep + env["PATH"]
    return env


def _make_bz3(tmp_path, text: bytes):
    plain = tmp_path / "data.txt"
    plain.write_bytes(text)
    subprocess.run(
        [sys.executable, "-m", "bzip3_tpu", "-e", "-b", "1", str(plain)],
        check=True, cwd=REPO,
    )
    return plain.with_suffix(".txt.bz3")


def test_bz3cat_roundtrip(tmp_path):
    text = b"hello wrapper world\n" * 200
    bz3 = _make_bz3(tmp_path, text)
    out = subprocess.run(
        ["sh", os.path.join(BIN, "bz3cat"), str(bz3)],
        capture_output=True, env=_env(), check=True,
    )
    assert out.stdout == text


def test_bunzip3_decompresses(tmp_path):
    text = b"abc 123\n" * 500
    bz3 = _make_bz3(tmp_path, text)
    (tmp_path / "data.txt").unlink()
    subprocess.run(
        ["sh", os.path.join(BIN, "bunzip3"), str(bz3)],
        capture_output=True, env=_env(), check=True,
    )
    assert (tmp_path / "data.txt").read_bytes() == text


def test_bz3grep_pattern_is_data_not_code(tmp_path):
    """A pattern full of shell metacharacters must be treated as data
    (the zgrep CVE-2022-1271 class) and still match."""
    needle = b"x'; echo PWNED; '$(rm -i nothing)\n"
    text = b"line one\n" + needle + b"line three\n"
    bz3 = _make_bz3(tmp_path, text)
    out = subprocess.run(
        ["sh", os.path.join(BIN, "bz3grep"), "-F",
         "x'; echo PWNED; '$(rm -i nothing)", str(bz3)],
        capture_output=True, env=_env(),
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout == needle
    assert b"PWNED" not in out.stderr


def test_bz3grep_no_match_exit_code(tmp_path):
    bz3 = _make_bz3(tmp_path, b"nothing interesting here\n" * 50)
    out = subprocess.run(
        ["sh", os.path.join(BIN, "bz3grep"), "absent-needle", str(bz3)],
        capture_output=True, env=_env(),
    )
    assert out.returncode != 0 and out.stdout == b""
