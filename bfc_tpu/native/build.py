"""On-demand build + ctypes binding for the native I/O library."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "fastxio.c"
_SO = _DIR / "libfastxio.so"

_lib = None


def get_lib():
    """Compile (if stale) and load the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not _SO.exists() or _SRC.stat().st_mtime > _SO.stat().st_mtime:
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.fastx_parse.restype = ctypes.c_long
        lib.fastx_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
