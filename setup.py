"""Packaging shim (config lives in pyproject.toml; reference ships a
setup.py at C19, SURVEY §2.1).  `python setup.py build_native` compiles
the C++ IO library into the package."""

import subprocess
import sys
from pathlib import Path

from setuptools import Command, setup


class BuildNative(Command):
    """Build native/ssrio.cpp -> ssr_eval_tpu/io/libssrio.so."""

    description = "build the native C++ IO library"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        native = Path(__file__).parent / "native"
        rc = subprocess.call(["make", "-C", str(native)])
        if rc != 0:
            print("native build failed (pure-Python fallback remains available)",
                  file=sys.stderr)


setup(cmdclass={"build_native": BuildNative})
