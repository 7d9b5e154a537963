"""ctypes bindings for the native graphcore host runtime (native/graphcore.cpp).

Auto-builds libgraphcore.so with g++ on first use when missing; every entry
point has a numpy fallback so the framework works without a toolchain. Use
`backend()` to see which implementation is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgraphcore.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("PLOTPOINTE_NO_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["bash", str(_NATIVE_DIR / "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        if lib.ppt_abi_version() != 1:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.ppt_build_csr.argtypes = [
            i64p, i64p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, f32p, i32p,
        ]
        lib.ppt_leave_last2.argtypes = [i32p, i64p, ctypes.c_int64, ctypes.c_int32, i8p]
        lib.ppt_padded_positives.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
        ]
        _lib = lib
    except (OSError, subprocess.SubprocessError):
        _lib = None
    return _lib


def backend() -> str:
    return "native" if _load() is not None else "numpy"


def build_csr(
    src: np.ndarray, dst: np.ndarray, weight: Optional[np.ndarray], n_nodes: int, e_pad: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(dst,src)-sorted padded edge arrays + CSR row_ptr. Native counting sort
    (O(E)) with numpy lexsort fallback."""
    e = len(src)
    lib = _load()
    if lib is not None:
        out_src = np.empty(e_pad, np.int32)
        out_dst = np.empty(e_pad, np.int32)
        out_w = np.empty(e_pad, np.float32)
        row_ptr = np.empty(n_nodes + 2, np.int32)
        w = np.ascontiguousarray(weight, np.float32) if weight is not None else None
        lib.ppt_build_csr(
            np.ascontiguousarray(src, np.int64),
            np.ascontiguousarray(dst, np.int64),
            None if w is None else w.ctypes.data_as(ctypes.c_void_p),
            e, n_nodes, e_pad,
            out_src, out_dst, out_w, row_ptr,
        )
        return out_src, out_dst, out_w, row_ptr
    # numpy fallback
    w = np.ones(e, np.float32) if weight is None else np.asarray(weight, np.float32)
    order = np.lexsort((src, dst))
    s, d, w = np.asarray(src)[order], np.asarray(dst)[order], w[order]
    pad = e_pad - e
    out_src = np.concatenate([s, np.full(pad, n_nodes)]).astype(np.int32)
    out_dst = np.concatenate([d, np.full(pad, n_nodes)]).astype(np.int32)
    out_w = np.concatenate([w, np.zeros(pad, np.float32)])
    counts = np.bincount(d, minlength=n_nodes + 1)
    row_ptr = np.zeros(n_nodes + 2, np.int32)
    np.cumsum(counts, out=row_ptr[1 : n_nodes + 2][: len(counts)])
    row_ptr[n_nodes + 1] = e_pad
    return out_src, out_dst, out_w, row_ptr


def leave_last2_roles(u: np.ndarray, ts: np.ndarray, n_users: int) -> np.ndarray:
    """Role per interaction row: 0 train, 1 val, 2 test, 3 dropped."""
    n = len(u)
    lib = _load()
    if lib is not None:
        role = np.empty(n, np.int8)
        lib.ppt_leave_last2(
            np.ascontiguousarray(u, np.int32), np.ascontiguousarray(ts, np.int64), n, n_users, role
        )
        return role
    # numpy fallback (same logic as data/splits.py)
    order = np.lexsort((ts, u))
    su = np.asarray(u)[order]
    boundary = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
    counts = np.diff(np.r_[boundary, n])
    pos = np.arange(n) - np.repeat(boundary, counts)
    cnt = np.repeat(counts, counts)
    role_sorted = np.full(n, 0, np.int8)
    role_sorted[cnt < 2] = 3
    role_sorted[(cnt >= 3) & (pos == cnt - 2)] = 1
    role_sorted[(cnt >= 2) & (pos == cnt - 1)] = 2
    role = np.empty(n, np.int8)
    role[order] = role_sorted
    return role


def padded_positives_native(
    train_u: np.ndarray, train_i: np.ndarray, n_users: int, n_items: int, p: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native sorted/deduped positive table; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    table = np.empty((n_users, p), np.int32)
    deg = np.empty(n_users, np.int32)
    lib.ppt_padded_positives(
        np.ascontiguousarray(train_u, np.int32),
        np.ascontiguousarray(train_i, np.int32),
        len(train_u), n_users, n_items, p, table, deg,
    )
    return table, deg
