"""Native (C++) host-side kernels, built on demand and loaded via ctypes.

The reference leans on external native libraries for its performance-critical paths
(SURVEY §2.4); this package holds our own: currently the control-map renderer
(control_render.cpp). Build: g++ -O3 -shared; cached under ~/.cache/goal_force_tpu.
Falls back cleanly (native() returns None) when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "control_render.cpp")
_PM_SRC = os.path.join(os.path.dirname(__file__), "patchmatch.cpp")


def _build(src: str, stem: str, extra_flags=()) -> ctypes.CDLL:
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "goal_force_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{stem}_{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               *extra_flags, src, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    return ctypes.CDLL(so_path)


@lru_cache(maxsize=1)
def patchmatch_native() -> Optional[ctypes.CDLL]:
    """FastBlend PatchMatch kernels (patchmatch.cpp); None if unavailable."""
    try:
        lib = _build(_PM_SRC, "patchmatch", ("-pthread",))
        import numpy as np
        from numpy.ctypeslib import ndpointer

        f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
        ints = [ctypes.c_int] * 6
        lib.gf_pm_patch_error.argtypes = [*ints, f32, i32, f32, f32]
        lib.gf_pm_pairwise_error.argtypes = [*ints, f32, i32, f32, i32, f32]
        lib.gf_pm_remap.argtypes = [*ints, f32, i32, f32]
        return lib
    except Exception:
        return None


@lru_cache(maxsize=1)
def native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "goal_force_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"control_render_{digest}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", so_path]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        import numpy as np
        from numpy.ctypeslib import ndpointer

        f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gf_add_moving_blob.argtypes = [
            f32, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32, f32, ctypes.c_float, ctypes.c_float,
        ]
        lib.gf_add_static_blobs.argtypes = [
            f32, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32, f32, f32, ctypes.c_int, ctypes.c_float,
        ]
        lib.gf_clamp01.argtypes = [f32, ctypes.c_int64]
        return lib
    except Exception:
        return None
