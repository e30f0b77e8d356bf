"""Native (C++) host-side components.

The reference leans on external compiled deps for its host-side hot
paths (open3d CUDA fixed-radius search, torch_scatter CSR kernels —
SURVEY.md §2 table). Here the equivalents are small self-contained C++
translation units compiled on first use with the system toolchain and
bound via ctypes; everything degrades gracefully to the numpy paths if
no compiler is available.

Device-side compute stays in XLA/Pallas — this package is strictly for
host precompute (neighbor lists, CSR layouts) that feeds static-shaped
tensors to the TPU.
"""

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent
_BUILD_DIR = _SRC_DIR / "_build"

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _compile(src: Path, out: Path) -> bool:
    """Compile one translation unit to a shared object; True on success."""
    out.parent.mkdir(parents=True, exist_ok=True)
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            str(src), "-o", str(out)]
    for extra in (["-fopenmp"], []):  # prefer OpenMP, fall back silently
        try:
            res = subprocess.run(
                base[:1] + extra + base[1:],
                capture_output=True, timeout=180,
            )
            if res.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            return False
    return False


def _load() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("NEURALOP_TPU_DISABLE_NATIVE"):
        return None
    src = _SRC_DIR / "neighbor_search.cpp"
    tag = sysconfig.get_platform().replace("-", "_")
    so = _BUILD_DIR / f"_native_{tag}.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            if not _compile(src, so):
                return None
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    fn = lib.fixed_radius_search
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def fixed_radius_search_cpp(data, queries, radius: float):
    """CSR fixed-radius search via the C++ grid-hash kernel.

    Returns ``(neighbors_index, neighbors_row_splits)`` as int64 numpy
    arrays (ascending index order per query, identical to the numpy
    fallback), or None if the native library is unavailable.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    if data.ndim != 2 or queries.ndim != 2 or data.shape[1] != queries.shape[1]:
        raise ValueError(
            f"expected (n,d)/(m,d) point arrays, got {data.shape} and "
            f"{queries.shape}"
        )
    dim = data.shape[1]
    if dim > 3:
        return None  # grid hash supports 1-3 spatial dims
    n, m = data.shape[0], queries.shape[0]
    row_splits = np.zeros(m + 1, dtype=np.int64)
    fptr = ctypes.POINTER(ctypes.c_float)
    iptr = ctypes.POINTER(ctypes.c_int64)
    d_p = data.ctypes.data_as(fptr)
    q_p = queries.ctypes.data_as(fptr)
    rs_p = row_splits.ctypes.data_as(iptr)
    total = lib.fixed_radius_search(
        d_p, n, q_p, m, dim, radius, 0, rs_p, None
    )
    if total < 0:
        return None
    indices = np.empty(max(int(total), 1), dtype=np.int64)
    lib.fixed_radius_search(
        d_p, n, q_p, m, dim, radius, 1, rs_p,
        indices.ctypes.data_as(iptr),
    )
    return indices[: int(total)], row_splits
