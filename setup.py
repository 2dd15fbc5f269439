"""Build hooks: compile the native host library into the wheel.

The reference ships its C++ core via pybind11 extensions + a cibuildwheel
workflow (.github/workflows/build_wheels.yml, setup.py).  Here the native
code is a plain C-ABI shared library consumed through ctypes, so the build
step is a single compiler invocation; the library lands inside the package
(vectorian_tpu/_native/) and vectorian_tpu.native falls back to the
repo-level lazy `make -C native` build in dev checkouts.  Wheels become
platform-tagged through the custom build; environments without a compiler
still work — every native entry point has a python fallback.
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BinaryDistribution(Distribution):
    """Force a platform wheel tag: the package embeds a compiled .so."""

    def has_ext_modules(self):
        return True


class BuildWithNative(build_py):
    def run(self):
        super().run()
        root = Path(__file__).resolve().parent
        src = root / "native" / "vectorian_native.cpp"
        if not src.exists() or shutil.which("g++") is None:
            return  # pure-python wheel; ctypes loader falls back
        out_dir = Path(self.build_lib) / "vectorian_tpu" / "_native"
        out_dir.mkdir(parents=True, exist_ok=True)
        so = out_dir / "libvectorian_native.so"
        cmd = [
            "g++", "-O3", "-fPIC", "-std=c++17", "-Wall", "-shared",
            "-o", str(so), str(src),
        ]
        try:
            subprocess.run(cmd, check=True)
        except subprocess.CalledProcessError:
            so.unlink(missing_ok=True)  # degrade to pure python


setup(
    cmdclass={"build_py": BuildWithNative},
    distclass=BinaryDistribution,
)
