"""Differential campaign against the compiled reference binary.

Local-only harness (needs /root/reference and a C toolchain): per
trial, draw a data class + block size, then require

  1. our CLI encode == `bzip3ref -e` byte-for-byte,
  2. `bzip3ref -d` decodes our stream back to the input,
  3. our CLI decodes the reference's stream back to the input,
  4. a corrupted copy (byte flips or truncation) gets the same
     accept/reject from both, and identical output on mutual accept.

Usage: python examples/differential_vs_reference.py [seed] [trials]
(cf. the reference's AFL harnesses, examples/fuzz-*.c — this is the
cross-IMPLEMENTATION analogue the reference cannot have.)
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFBIN = "/tmp/refbuild/bzip3ref"


def ensure_refbin():
    if os.path.exists(REFBIN):
        return True
    if not os.path.exists("/root/reference/src/libbz3.c"):
        return False
    os.makedirs(os.path.dirname(REFBIN), exist_ok=True)
    subprocess.run(
        ["gcc", "-O2", '-DVERSION="1.5.2"', "-DPTHREAD",
         "-I/root/reference/include", "/root/reference/src/libbz3.c",
         "/root/reference/src/main.c", "-o", REFBIN, "-lpthread"],
        check=True, capture_output=True,
    )
    return True


def make_data(rng) -> bytes:
    n = int(rng.integers(0, 3 << 20))
    kind = int(rng.integers(0, 6))
    if kind == 0:  # uniform random (incompressible)
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:  # runny: repeat the previous byte with prob 0.9
        if n == 0:
            return b""
        raw = rng.integers(0, 256, n, dtype=np.uint8)
        fresh = rng.random(n) < 0.1
        fresh[0] = True
        src = np.maximum.accumulate(np.where(fresh, np.arange(n), 0))
        return raw[src].tobytes()
    if kind == 2:  # small alphabet
        return rng.integers(97, 97 + int(rng.integers(2, 8)), n, dtype=np.uint8).tobytes()
    if kind == 3:  # repeated phrase + noise
        base = rng.integers(32, 127, 257, dtype=np.uint8).tobytes()
        reps = base * (n // max(1, len(base)) + 1)
        return reps[:n]
    if kind == 4:  # all zeros
        return bytes(n)
    from bench import make_corpus  # text-like

    return make_corpus(n, seed=int(rng.integers(1 << 30)))


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    if not ensure_refbin():
        print("reference not available; skipping")
        return 0
    rng = np.random.default_rng(seed)
    td = tempfile.mkdtemp(prefix="bz3diff")
    our = [sys.executable, "-m", "bzip3_tpu", "--engine", "native"]
    for t in range(trials):
        data = make_data(rng)
        b_mib = int(rng.integers(1, 5)) if len(data) else 1
        plain = os.path.join(td, "in.bin")
        with open(plain, "wb") as f:
            f.write(data)
        ours = subprocess.run(
            [*our, "-e", "-b", str(b_mib), "-c", plain],
            capture_output=True, check=True).stdout
        refs = subprocess.run(
            [REFBIN, "-e", "-b", str(b_mib), "-c"], input=data,
            capture_output=True, check=True).stdout
        assert ours == refs, f"trial {t}: encode mismatch ({len(data)}B, -b {b_mib})"
        back = subprocess.run([REFBIN, "-d", "-c"], input=ours,
                              capture_output=True, check=True).stdout
        assert back == data, f"trial {t}: ref cannot decode our stream"
        enc_path = os.path.join(td, "in.bz3")
        with open(enc_path, "wb") as f:
            f.write(refs)
        back2 = subprocess.run([*our, "-d", "-c", enc_path],
                               capture_output=True, check=True).stdout
        assert back2 == data, f"trial {t}: we cannot decode ref stream"

        # corruption agreement
        if len(ours) > 16:
            b = bytearray(ours)
            if t % 3 == 0:
                b = b[: int(rng.integers(8, len(b)))]
            else:
                for _ in range(int(rng.integers(1, 4))):
                    b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
            with open(enc_path, "wb") as f:
                f.write(bytes(b))
            r1 = subprocess.run([REFBIN, "-d", "-c", enc_path], capture_output=True)
            r2 = subprocess.run([*our, "-d", "-c", enc_path], capture_output=True)
            ok1, ok2 = r1.returncode == 0, r2.returncode == 0
            assert ok1 == ok2, f"trial {t}: corruption verdict split ({ok1} vs {ok2})"
            if ok1:
                assert r1.stdout == r2.stdout, f"trial {t}: corrupted-accept output split"
        if (t + 1) % 10 == 0:
            print(f"{t + 1}/{trials} ok", flush=True)
    print("all ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
