"""Build the native shared library (g++) with content-hash caching.

The library is rebuilt only when a source file or the compile flags change;
the cached .so lives in ``seekr_tpu/native/_build/``.  No external build
system is required — plain portable g++ -O3 (no -march, so a cached .so
remains valid if the container migrates hosts).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_HERE, "src")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SOURCES = ("leiden.cpp", "fastio.cpp", "csvio.cpp", "sortops.cpp",
            "statops.cpp")
# headers are hashed (cache invalidation) but not passed to g++ directly
_HEADERS = ("host_parallel.h",)
_FLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-pthread"]
_LOCK = threading.Lock()


class NativeBuildError(RuntimeError):
    pass


def _source_hash() -> str:
    h = hashlib.sha256()
    h.update(" ".join(_FLAGS).encode())
    for name in _SOURCES + _HEADERS:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_native_lib() -> str:
    """Compile (if needed) and return the path to libseekr_native.so."""
    with _LOCK:
        tag = _source_hash()
        lib_path = os.path.join(_BUILD_DIR, f"libseekr_native.{tag}.so")
        if os.path.exists(lib_path):
            return lib_path
        os.makedirs(_BUILD_DIR, exist_ok=True)
        # per-process tmp target: concurrent first-time builds in separate
        # processes must not interleave output before the atomic publish
        tmp_path = f"{lib_path}.tmp.{os.getpid()}"
        cmd = ["g++", *_FLAGS, "-o", tmp_path] + [
            os.path.join(_SRC_DIR, s) for s in _SOURCES]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=300)
            if proc.returncode != 0:
                raise NativeBuildError(
                    f"g++ failed ({proc.returncode}):\n{proc.stderr}")
            os.replace(tmp_path, lib_path)
        except (OSError, subprocess.TimeoutExpired) as e:
            raise NativeBuildError(f"failed to run g++: {e}") from e
        finally:
            # failed/timed-out builds must not leak partial tmp outputs
            try:
                os.unlink(tmp_path)
            except FileNotFoundError:
                pass
        return lib_path
