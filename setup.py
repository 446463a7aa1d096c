"""Build glue: compiles the native host solver into the package.

The reference reaches its native code through a CMake-driven setuptools
extension (setup.py:12-76 there). Here the native component is a plain C ABI
shared library (native/host_solver.cpp, no third-party deps), compiled with
one g++ invocation and shipped as package data next to its ctypes loader
(diffqcqp_tpu/native/host_solver.py). Editable/in-place use works too:
``make -C native`` leaves the library in native/, where the loader also
looks.
"""

import subprocess
import sysconfig
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        src = root / "native" / "host_solver.cpp"
        out = root / "diffqcqp_tpu" / "native" / "libdiffqcqp_host.so"
        cxx = sysconfig.get_config_var("CXX") or "g++"
        cmd = cxx.split() + [
            "-O3", "-march=native", "-fPIC", "-std=c++17", "-fopenmp",
            "-shared", "-o", str(out), str(src),
        ]
        try:
            subprocess.run(cmd, check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            # The JAX solvers are fully functional without the native
            # library (it backs the CPU baseline/oracle only).
            print(f"WARNING: native host solver build failed ({e}); "
                  "continuing without it")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
