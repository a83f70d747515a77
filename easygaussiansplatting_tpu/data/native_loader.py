"""ctypes bindings for the native COLMAP parser (native/colmap_reader.cc).

Drop-in accelerations of data/colmap.py's readers: the mmap-based C++ parser
walks real scenes (10^5-10^6 points with tracks) in milliseconds where the
Python struct loop takes seconds. `available()` gates use; the dataset layer
falls back to the pure-Python readers automatically, so the native library
is an optimisation, never a requirement.
"""

import ctypes
import os
from pathlib import Path

import numpy as np

from easygaussiansplatting_tpu.data.colmap import CAMERA_MODELS, ColmapCamera, ColmapImage

_LIB = None
_LIB_TRIED = False


def _fresh(so: Path) -> bool:
    """A stale .so (older than its source) must not shadow code edits."""
    src = so.with_name("colmap_reader.cc")
    return not src.is_file() or so.stat().st_mtime >= src.stat().st_mtime


def _find_lib():
    repo_so = Path(__file__).resolve().parents[2] / "native" / "libegs_native.so"
    src = repo_so.with_name("colmap_reader.cc")
    if (src.is_file() and (not repo_so.is_file() or not _fresh(repo_so))
            and not os.environ.get("EGS_NO_AUTO_BUILD")):
        # (re)build in place; never load a stale binary. Auto-rebuild is a
        # convenience for source checkouts — EGS_NO_AUTO_BUILD=1 keeps
        # library lookup side-effect free, and a failed build is warned
        # about (not swallowed) so a broken toolchain is visible.
        import subprocess
        import warnings

        proc = subprocess.run(
            ["make", "-C", str(repo_so.parent)],
            capture_output=True, check=False, text=True,
        )
        if proc.returncode != 0:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
            warnings.warn(
                "native colmap reader build failed (falling back to the "
                "pure-Python parser; set EGS_NO_AUTO_BUILD=1 to silence): "
                + " | ".join(tail)
            )
    cands = [repo_so, Path(os.environ.get("EGS_NATIVE_LIB", ""))]
    for c in cands:
        if c and c.is_file() and _fresh(c):
            return c
    return None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.egs_read_points3d.restype = ctypes.c_int64
    lib.egs_read_images.restype = ctypes.c_int64
    lib.egs_read_cameras.restype = ctypes.c_int64
    lib.egs_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available():
    return _load() is not None


def _take(ptr, ctype, count, lib):
    """Copy `count` elements from a C buffer into numpy and free it."""
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(count,)
    ).copy()
    lib.egs_free(ptr)
    return arr


def read_points3d_binary(path):
    lib = _load()
    xyz_p = ctypes.c_void_p()
    rgb_p = ctypes.c_void_p()
    err_p = ctypes.c_void_p()
    n = lib.egs_read_points3d(
        str(path).encode(), ctypes.byref(xyz_p), ctypes.byref(rgb_p), ctypes.byref(err_p)
    )
    if n < 0:
        raise IOError(f"native parse failed: {path}")
    xyz = _take(xyz_p, ctypes.c_double, n * 3, lib).reshape(-1, 3)
    rgb = _take(rgb_p, ctypes.c_uint8, n * 3, lib).reshape(-1, 3)
    err = _take(err_p, ctypes.c_double, n, lib)
    return xyz, rgb, err


def read_images_binary(path):
    lib = _load()
    ids_p = ctypes.c_void_p()
    cams_p = ctypes.c_void_p()
    q_p = ctypes.c_void_p()
    t_p = ctypes.c_void_p()
    names_p = ctypes.c_void_p()
    names_len = ctypes.c_int64()
    n = lib.egs_read_images(
        str(path).encode(), ctypes.byref(ids_p), ctypes.byref(cams_p),
        ctypes.byref(q_p), ctypes.byref(t_p), ctypes.byref(names_p),
        ctypes.byref(names_len),
    )
    if n < 0:
        raise IOError(f"native parse failed: {path}")
    ids = _take(ids_p, ctypes.c_int32, n, lib)
    cams = _take(cams_p, ctypes.c_int32, n, lib)
    qvecs = _take(q_p, ctypes.c_double, n * 4, lib).reshape(-1, 4)
    tvecs = _take(t_p, ctypes.c_double, n * 3, lib).reshape(-1, 3)
    blob = _take(names_p, ctypes.c_uint8, names_len.value, lib).tobytes()
    names = blob.split(b"\x00")[:n]
    return {
        int(ids[i]): ColmapImage(
            int(ids[i]), qvecs[i], tvecs[i], int(cams[i]), names[i].decode("utf-8")
        )
        for i in range(n)
    }


def read_cameras_binary(path):
    lib = _load()
    ids_p = ctypes.c_void_p()
    models_p = ctypes.c_void_p()
    w_p = ctypes.c_void_p()
    h_p = ctypes.c_void_p()
    par_p = ctypes.c_void_p()
    cnt_p = ctypes.c_void_p()
    n = lib.egs_read_cameras(
        str(path).encode(), ctypes.byref(ids_p), ctypes.byref(models_p),
        ctypes.byref(w_p), ctypes.byref(h_p), ctypes.byref(par_p), ctypes.byref(cnt_p),
    )
    if n < 0:
        raise IOError(f"native parse failed: {path}")
    ids = _take(ids_p, ctypes.c_int32, n, lib)
    models = _take(models_p, ctypes.c_int32, n, lib)
    widths = _take(w_p, ctypes.c_int64, n, lib)
    heights = _take(h_p, ctypes.c_int64, n, lib)
    params = _take(par_p, ctypes.c_double, n * 12, lib).reshape(-1, 12)
    counts = _take(cnt_p, ctypes.c_int32, n, lib)
    return {
        int(ids[i]): ColmapCamera(
            int(ids[i]), CAMERA_MODELS[int(models[i])][0],
            int(widths[i]), int(heights[i]), params[i, : counts[i]].copy(),
        )
        for i in range(n)
    }
