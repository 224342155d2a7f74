"""Build hook: compile the native host engine at install time.

``pip install .`` ships ``bzip3_tpu/_native_lib/libbz3n.so`` compiled
from ``csrc/bz3n.cpp`` (the reference installs libbzip3 via
autotools/CMake; this is the wheel-world equivalent).  Environments
without a C++ toolchain still install fine — the engine registry falls
back to the oracle/device paths (bzip3_tpu/engines.py).
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "csrc", "bz3n.cpp")
        if not os.path.exists(src):
            return
        dest_dir = os.path.join(self.build_lib, "bzip3_tpu", "_native_lib")
        os.makedirs(dest_dir, exist_ok=True)
        out = os.path.join(dest_dir, "libbz3n.so")
        cxx = os.environ.get("CXX", "g++")
        cmd = [cxx, "-O3", "-fPIC", "-shared", "-pthread", src, "-o", out]
        try:
            subprocess.run(cmd, check=True)
            print(f"built native engine: {out}")
        except Exception as exc:  # toolchain-less: soft-fail to oracle
            print(f"warning: native engine build skipped ({exc})")


setup(cmdclass={"build_py": build_py_with_native})
