"""Build-and-load for the in-repo C++ runtime pieces.

The reference leans on prebuilt native wheels (xgrammar C++, triteia CUDA);
here the host-side native code lives in ``scratchpad_tpu/csrc`` and is
compiled on first use with the system toolchain into a per-user cache, then
loaded over a plain C ABI with ctypes (pybind11 is not in the image).
A missing/failed toolchain degrades to the pure-Python fallbacks at the
call sites, never to an import error.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

from scratchpad_tpu.utils.logging import get_logger

logger = get_logger("native")

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_CACHE = Path(
    os.environ.get("SPTPU_NATIVE_CACHE", os.path.expanduser("~/.cache/scratchpad_tpu"))
)
_lock = threading.Lock()
_libs: dict[str, Optional[ctypes.CDLL]] = {}


def _build(name: str) -> Optional[Path]:
    src = _CSRC / f"{name}.cpp"
    if not src.exists():
        return None
    # -march=native binaries are host-specific: include the machine/ISA in
    # the cache key so a cache dir shared across heterogeneous hosts never
    # serves a .so with unsupported instructions
    import platform

    isa = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    isa += line
                    break
    except OSError:
        pass
    tag = hashlib.sha256(src.read_bytes() + isa.encode()).hexdigest()[:16]
    out = _CACHE / f"{name}-{tag}.so"
    if out.exists():
        return out
    _CACHE.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".{os.getpid()}.tmp")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        str(tmp),
        str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:  # toolchain missing / compile error
        err = getattr(e, "stderr", b"")
        logger.warning(
            "native build of %s failed (%s); using Python fallback", name,
            (err or str(e).encode())[:200],
        )
        return None
    os.replace(tmp, out)
    return out


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile (cached) and dlopen csrc/<name>.cpp; None on any failure."""
    with _lock:
        if name in _libs:
            return _libs[name]
        lib = None
        try:
            path = _build(name)
            if path is not None:
                lib = ctypes.CDLL(str(path))
        except Exception as e:
            logger.warning("native load of %s failed: %s", name, e)
            lib = None
        _libs[name] = lib
        return lib
