"""Build the native C++ runtime modules (g++ -> shared libraries).

Invoked on demand by bindings.py; artifacts cached under
``audax/native/build/``. Rebuilds when any source file is newer than the
library. Two targets so dependencies stay separable:

  * libaudax_native.so  — self-contained (SF2 synth, fallback synth)
  * libaudax_decode.so  — compressed-audio decode/encode, links the system
    libavformat/libavcodec/libavutil (present in this image); callers fall
    back gracefully when those are absent on a host
"""

from __future__ import annotations

import os
import subprocess
from typing import List

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC_DIR = os.path.join(_HERE, "src")
DECODE_SRC_DIR = os.path.join(_HERE, "src_decode")
BUILD_DIR = os.path.join(_HERE, "build")
LIB_PATH = os.path.join(BUILD_DIR, "libaudax_native.so")
DECODE_LIB_PATH = os.path.join(BUILD_DIR, "libaudax_decode.so")

_CXX_FLAGS = ["-O2", "-shared", "-fPIC", "-std=c++17", "-Wall"]
_DECODE_LIBS = ["-lavformat", "-lavcodec", "-lavutil"]


def _sources(src_dir: str = SRC_DIR) -> List[str]:
    return sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".cpp"))


def _needs(lib_path: str, src_dir: str) -> bool:
    if not os.path.exists(lib_path):
        return True
    lib_mtime = os.path.getmtime(lib_path)
    return any(os.path.getmtime(s) > lib_mtime for s in _sources(src_dir))


def needs_build() -> bool:
    return _needs(LIB_PATH, SRC_DIR)


def _compile(lib_path: str, src_dir: str, extra: List[str]) -> str:
    os.makedirs(BUILD_DIR, exist_ok=True)
    cmd = ["g++", *_CXX_FLAGS, "-o", lib_path, *_sources(src_dir), *extra]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib_path


def build(force: bool = False) -> str:
    if force or _needs(LIB_PATH, SRC_DIR):
        _compile(LIB_PATH, SRC_DIR, [])
    return LIB_PATH


def build_decode(force: bool = False) -> str:
    """Build the lavf/lavc-linked decode module; raises CalledProcessError
    when the system ffmpeg libraries/headers are missing."""
    if force or _needs(DECODE_LIB_PATH, DECODE_SRC_DIR):
        _compile(DECODE_LIB_PATH, DECODE_SRC_DIR, _DECODE_LIBS)
    return DECODE_LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
    try:
        print(build_decode(force=True))
    except Exception as e:  # pragma: no cover - no ffmpeg dev libs
        print(f"decode module skipped: {e}")
