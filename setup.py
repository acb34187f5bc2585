"""Build hook: compile the native fastops library alongside the package."""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        src = Path(__file__).parent / "platipy_tpu" / "native" / "src" / "fastops.cpp"
        out = Path(__file__).parent / "platipy_tpu" / "native" / "_fastops.so"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
                check=True,
            )
        except Exception as err:  # native layer is optional
            print(f"warning: native fastops build failed ({err}); JAX fallbacks will be used")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
