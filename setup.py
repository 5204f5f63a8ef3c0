"""Build hook for the native host-kernel library.

The reference ships a build for its amg_core extension
(pyamg/amg_core/setup.py); here the equivalent is a plain C++ shared
library bound via ctypes.  It is compiled at install time by this hook,
and — as a fallback for source checkouts — rebuilt on first import by
``pyamg_tpu.amg_core._build()`` whenever the cached .so is missing or
older than ``core.cpp``.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = Path(self.build_lib) / "pyamg_tpu" / "amg_core" / "core.cpp"
        if not src.exists():                      # editable install
            src = Path(__file__).parent / "pyamg_tpu" / "amg_core" / \
                "core.cpp"
        out = src.with_name("libamg_core.so")
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(src), "-o", str(out)]
        try:
            subprocess.run(base[:1] + ["-fopenmp"] + base[1:], check=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            try:
                subprocess.run(base, check=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                print("warning: native amg_core build failed; the package "
                      "will use its numpy fallbacks", file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
