"""ctypes bindings for the native C++ setup runtime (native/).

Loads libfustpu_native.so if present (build with `make -C native`); every
entry point has a pure-numpy fallback so the package works without the
build step.  The native path matters at the 10^8-DOF scale where setup-time
geometry precompute over all cells dominates model construction.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.environ.get("FUSTPU_NATIVE_LIB", ""),
                 os.path.join(here, "native", "libfustpu_native.so")):
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                if lib.fustpu_abi_version() != 1:
                    continue
                _configure(lib)
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def _configure(lib):
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int32)
    lib.fustpu_cell_geometry.argtypes = [c_d, c_d, c_d, ctypes.c_int64,
                                         ctypes.c_int32, c_d, c_d]
    lib.fustpu_facet_geometry.argtypes = [c_d, c_d, c_d, c_i,
                                          ctypes.c_int64, ctypes.c_int32,
                                          c_d]
    lib.fustpu_box_dofmap.argtypes = [ctypes.c_int32] * 4 + [c_i]
    lib.fustpu_mass_diagonal.argtypes = [c_d, c_d, c_i, ctypes.c_int64,
                                         ctypes.c_int32, c_d]


def available() -> bool:
    return _find_lib() is not None


def _ptr(a, typ=ctypes.c_double):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def cell_geometry(corners: np.ndarray, qpts: np.ndarray,
                  qwts: np.ndarray):
    """Native detJ/G; returns None if the library is unavailable."""
    lib = _find_lib()
    if lib is None:
        return None
    corners = np.ascontiguousarray(corners, np.float64)
    qpts = np.ascontiguousarray(qpts, np.float64)
    qwts = np.ascontiguousarray(qwts, np.float64)
    ncells, nq = corners.shape[0], qwts.size
    detJ = np.empty((ncells, nq))
    G = np.empty((ncells, nq, 6))
    lib.fustpu_cell_geometry(_ptr(corners), _ptr(qpts), _ptr(qwts),
                             ncells, nq, _ptr(detJ), _ptr(G))
    return detJ, G


def facet_geometry(corners: np.ndarray, qpts_f: np.ndarray,
                   qwts: np.ndarray, boundary_data: np.ndarray):
    lib = _find_lib()
    if lib is None:
        return None
    corners = np.ascontiguousarray(corners, np.float64)
    qpts_f = np.ascontiguousarray(qpts_f, np.float64)
    qwts = np.ascontiguousarray(qwts, np.float64)
    bd = np.ascontiguousarray(boundary_data, np.int32)
    nf, nq = bd.shape[0], qwts.size
    detJ_f = np.empty((nf, nq))
    lib.fustpu_facet_geometry(_ptr(corners), _ptr(qpts_f), _ptr(qwts),
                              _ptr(bd, ctypes.c_int32), nf, nq,
                              _ptr(detJ_f))
    return detJ_f


def box_dofmap(nc, P: int):
    lib = _find_lib()
    if lib is None:
        return None
    ncx, ncy, ncz = nc
    n = P + 1
    out = np.empty((ncx * ncy * ncz, n**3), np.int32)
    lib.fustpu_box_dofmap(ncx, ncy, ncz, P, _ptr(out, ctypes.c_int32))
    return out


def mass_diagonal(detJ: np.ndarray, coeff, dofmap: np.ndarray,
                  ndofs: int):
    lib = _find_lib()
    if lib is None:
        return None
    detJ = np.ascontiguousarray(detJ, np.float64)
    dm = np.ascontiguousarray(dofmap, np.int32)
    m = np.zeros(ndofs)
    cptr = (_ptr(np.ascontiguousarray(coeff, np.float64))
            if coeff is not None else None)
    lib.fustpu_mass_diagonal(_ptr(detJ), cptr, _ptr(dm, ctypes.c_int32),
                             detJ.shape[0], detJ.shape[1], _ptr(m))
    return m
