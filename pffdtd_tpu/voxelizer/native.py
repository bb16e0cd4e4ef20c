"""ctypes bridge to the native C++/OpenMP voxelizer backend.

Compiles native/voxelizer.cpp on first use (cached as a shared library) and
exposes `calc_adj(vox_scene, block_size)` with the VoxScene result contract
(bn_ixyz, adj_bn, tidx_bn, ndist_bn — sorted by linear index).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libpffdtd_vox.so"
_lib = None


def _build():
    _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    src = _NATIVE_DIR / "voxelizer.cpp"
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(src), "-o", str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "voxelizer.cpp"
    if (not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < src.stat().st_mtime):
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vox_calc_adj.restype = ctypes.c_int64
    lib.vox_calc_adj.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,                     # tris, Ntris
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # xv, yv, zv
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,      # Nx, Ny, Nz
        ctypes.c_double, ctypes.c_int,                       # h, fcc
        ctypes.c_void_p, ctypes.c_void_p,                    # adj_full, ndist
        ctypes.c_void_p, ctypes.c_void_p,                    # tidx, nb_flag
    ]
    _lib = lib
    return lib


def pack_tris(tp) -> np.ndarray:
    """Pack a TriPre into the (Ntris, 30) float64 layout the kernel expects."""
    return np.ascontiguousarray(np.concatenate([
        tp.v.reshape(len(tp), 9),
        tp.unor, tp.cent, tp.eab_unor, tp.ebc_unor, tp.eca_unor,
        tp.bmin, tp.bmax,
    ], axis=1), np.float64)


def calc_adj(vs, block_size: int = 32):
    """Native adjacency computation for a VoxScene; returns the bn arrays."""
    lib = _load()
    cg, rg = vs.cg, vs.rg
    Nx, Ny, Nz = cg.Nx, cg.Ny, cg.Nz
    NN = vs.NN
    tris = pack_tris(rg.tris_pre)

    full = np.uint16((1 << NN) - 1)
    adj_full = np.full(Nx * Ny * Nz, full, np.uint16)
    ndist = np.full(Nx * Ny * Nz, np.inf, np.float64)
    tidx = np.full(Nx * Ny * Nz, -1, np.int32)
    nb_flag = np.zeros(Nx * Ny * Nz, np.uint8)
    xv = np.ascontiguousarray(cg.xv, np.float64)
    yv = np.ascontiguousarray(cg.yv, np.float64)
    zv = np.ascontiguousarray(cg.zv, np.float64)

    lib.vox_calc_adj(
        tris.ctypes.data, tris.shape[0],
        xv.ctypes.data, yv.ctypes.data, zv.ctypes.data,
        Nx, Ny, Nz, float(cg.h), int(vs.fcc),
        adj_full.ctypes.data, ndist.ctypes.data,
        tidx.ctypes.data, nb_flag.ctypes.data)

    bn_ixyz = np.flatnonzero(adj_full != full).astype(np.int64)
    packed = adj_full[bn_ixyz]
    adj_bn = np.zeros((bn_ixyz.size, NN), bool)
    for k in range(NN):
        adj_bn[:, k] = (packed >> k) & 1
    return bn_ixyz, adj_bn, tidx[bn_ixyz], ndist[bn_ixyz]
