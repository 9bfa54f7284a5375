"""Build script: the Python package plus the optional native C++
host-kernel extension (rayopt_tpu/native/simplex_native.cpp).

The native kernels are also compiled on demand at import time via
ctypes (rayopt_tpu/native/build.py), so `pip install .` works without
a C++ toolchain; building here just pre-compiles them.
"""

import os

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        try:
            import subprocess
            src = os.path.join("rayopt_tpu", "native",
                               "simplex_native.cpp")
            out = os.path.join(self.build_lib, "rayopt_tpu", "native",
                               "simplex_native.so")
            subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                            "-std=c++17", src, "-o", out], check=True)
        except Exception as e:  # toolchain optional
            print("native kernels not prebuilt (%s); they will be "
                  "compiled on demand" % e)


setup(cmdclass={"build_py": BuildWithNative})
