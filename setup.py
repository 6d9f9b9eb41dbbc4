"""Packaging + native-extension build.

`python setup.py build_native` compiles the C++ host-runtime library
(equivalent of the reference's build_all_env.sh mycpp/mycuda builds);
`pip install -e .` style installs are intentionally unnecessary — the repo
root is importable directly.
"""
import subprocess
import sys
from pathlib import Path

from setuptools import Command, find_packages, setup


class BuildNative(Command):
    description = "build native/libsixdof_native.so"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        subprocess.run([str(Path(__file__).parent / "native" / "build.sh")], check=True)


setup(
    name="sixdof_tpu",
    version="0.1.0",
    description="TPU-native 6-DoF pose estimation and defect projection",
    packages=find_packages(include=["sixdof_tpu*"]),
    python_requires=">=3.10",
    cmdclass={"build_native": BuildNative},
)
