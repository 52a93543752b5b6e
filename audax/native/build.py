"""Build the native C++ runtime modules (g++ -> shared library).

Invoked on demand by bindings.py; artifacts cached under
``audax/native/build/``. Rebuilds when any source file is newer than the
library.
"""

from __future__ import annotations

import os
import subprocess
from typing import List

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC_DIR = os.path.join(_HERE, "src")
BUILD_DIR = os.path.join(_HERE, "build")
LIB_PATH = os.path.join(BUILD_DIR, "libaudax_native.so")

_CXX_FLAGS = ["-O2", "-shared", "-fPIC", "-std=c++17", "-Wall"]


def _sources() -> List[str]:
    return sorted(
        os.path.join(SRC_DIR, f) for f in os.listdir(SRC_DIR)
        if f.endswith(".cpp"))


def needs_build() -> bool:
    if not os.path.exists(LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(LIB_PATH)
    return any(os.path.getmtime(s) > lib_mtime for s in _sources())


def build(force: bool = False) -> str:
    if not force and not needs_build():
        return LIB_PATH
    os.makedirs(BUILD_DIR, exist_ok=True)
    cmd = ["g++", *_CXX_FLAGS, "-o", LIB_PATH, *_sources()]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
