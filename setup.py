"""Wheel build with the native host runtime compiled in.

Reference parity: python/setup.py:26-63 builds the reference's C library
into its wheel via scikit-build/cmake; here a custom build_ext compiles
csrc/ (plain make — no cmake dependency) and ships libpiquant_host.so as
package data, which runtime/host.py's loader picks up next to the wheel's
csrc/ directory or falls back to building in-tree.

Build a wheel:  python -m build --wheel   (or pip wheel .)
CI: .github/workflows/build-wheels.yml builds on tag pushes.
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution


class BinaryDistribution(Distribution):
    """Platform-tag the wheel: it bundles a compiled libpiquant_host.so."""

    def has_ext_modules(self):
        return True


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        csrc = root / "csrc"
        if shutil.which("make") and shutil.which("g++"):
            try:
                subprocess.run(["make", "-C", str(csrc)], check=True)
            except subprocess.CalledProcessError:
                print("WARNING: native host runtime build failed; the wheel "
                      "will fall back to the JAX reference path")
        super().run()
        # ship the shared library inside the package
        so = csrc / "libpiquant_host.so"
        if so.exists():
            dest = Path(self.build_lib) / "piquant_tpu" / "runtime"
            dest.mkdir(parents=True, exist_ok=True)
            shutil.copy2(so, dest / "libpiquant_host.so")


setup(cmdclass={"build_py": BuildWithNative}, distclass=BinaryDistribution)
