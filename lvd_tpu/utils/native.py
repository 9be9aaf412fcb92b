"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA/Pallas; host-side IO that would otherwise
serialize against device work is native C++. Currently: a GIF encoder
(native/gifenc.cc) that replaces the slow PIL quantize+LZW path. Builds
lazily with `make` on first use; falls back to PIL when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("LVD_DISABLE_NATIVE") == "1":
            return None
        so = os.path.join(_NATIVE_DIR, "libgifenc.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                print(f"[lvd_tpu] native build failed ({e}); using PIL fallback")
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.gif_encode.restype = ctypes.c_int
            lib.gif_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_char_p,
            ]
            _LIB = lib
        except OSError as e:
            print(f"[lvd_tpu] native load failed ({e}); using PIL fallback")
        return _LIB


def gif_encode(path: str, frames, fps: int = 8, dither: bool = True) -> bool:
    """Encode (F, H, W, 3) uint8 frames to a looping GIF. Returns False if
    the native encoder is unavailable (caller should fall back)."""
    import numpy as np

    lib = _load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    f, h, w, c = frames.shape
    if c != 3:
        return False
    rc = lib.gif_encode(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f,
        h,
        w,
        max(int(round(100 / fps)), 1),
        1 if dither else 0,
        path.encode(),
    )
    return rc == 0
