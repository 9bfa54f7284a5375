"""Compile-on-demand ctypes loader for the native host kernels.

The C++ source (simplex_native.cpp) is compiled once with the system
g++ into a per-user cache directory and loaded with ctypes; every
entry point has a NumPy fallback in rayopt_tpu.ops.simplex /
rayopt_tpu.utils.geometry, so the framework works without a compiler
(set RAYOPT_TPU_NO_NATIVE=1 to force the fallbacks).
"""

import ctypes
import functools
import hashlib
import logging
import os
import subprocess
import sysconfig

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "simplex_native.cpp")


def _cache_dir():
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    d = os.path.join(base, "rayopt_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build():
    src = open(_SRC, "rb").read()
    tag = hashlib.sha1(src).hexdigest()[:16]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_cache_dir(), f"simplex_native_{tag}{suffix}")
    if not os.path.exists(out):
        tmp = out + ".tmp.so"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, out)
    return out


@functools.lru_cache(maxsize=None)
def get_lib():
    """The loaded ctypes library, or None if unavailable."""
    if os.environ.get("RAYOPT_TPU_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:
        logger.info("native kernels unavailable (%s); using NumPy "
                    "fallbacks", e)
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f64p = ctypes.POINTER(ctypes.c_double)
    lib.rsx_simplex_enum.restype = ctypes.c_int64
    lib.rsx_simplex_enum.argtypes = [ctypes.c_int, ctypes.c_int,
                                     c_i32p, c_i32p]
    lib.rsx_mul_table.restype = ctypes.c_int64
    lib.rsx_mul_table.argtypes = [ctypes.c_int, ctypes.c_int,
                                  c_i32p, c_i32p, c_i32p]
    lib.rsx_mul.restype = None
    lib.rsx_mul.argtypes = [c_i32p, c_i32p, c_i32p, ctypes.c_int64,
                            c_f64p, c_f64p, c_f64p, ctypes.c_int64]
    lib.rsx_pow.restype = None
    lib.rsx_pow.argtypes = [c_i32p, c_i32p, c_i32p, ctypes.c_int64,
                            ctypes.c_int, c_f64p, ctypes.c_double,
                            c_f64p, ctypes.c_int64]
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.rsx_mul_grouped.restype = None
    lib.rsx_mul_grouped.argtypes = [c_i32p, c_i32p, c_i64p,
                                    ctypes.c_int64, c_f64p, c_f64p,
                                    c_f64p]
    lib.rsx_pow_grouped.restype = None
    lib.rsx_pow_grouped.argtypes = [c_i32p, c_i32p, c_i64p,
                                    ctypes.c_int64, ctypes.c_int,
                                    c_f64p, ctypes.c_double, c_f64p]
    lib.rsx_eval.restype = None
    lib.rsx_eval.argtypes = [c_i32p, ctypes.c_int64, ctypes.c_int,
                             c_f64p, c_f64p, ctypes.c_int64, c_f64p]
    lib.rsx_rotation_matrix.restype = None
    lib.rsx_rotation_matrix.argtypes = [ctypes.c_double, c_f64p, c_f64p]
    lib.rsx_euler_matrix_rxyz.restype = None
    lib.rsx_euler_matrix_rxyz.argtypes = [ctypes.c_double,
                                          ctypes.c_double,
                                          ctypes.c_double, c_f64p]
    lib.rsx_euler_from_matrix_rxyz.restype = None
    lib.rsx_euler_from_matrix_rxyz.argtypes = [c_f64p, c_f64p]
    return lib


def available():
    return get_lib() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mul_table(d, m):
    """Native multiplication-table generation; (out, ia, ib) arrays."""
    lib = get_lib()
    from ..ops.simplex import simplex_size
    cap = simplex_size(2*d, m)
    out = np.empty(cap, np.int32)
    ia = np.empty(cap, np.int32)
    ib = np.empty(cap, np.int32)
    n = lib.rsx_mul_table(d, m, _i32p(out), _i32p(ia), _i32p(ib))
    assert n == cap, (n, cap)
    return out, ia, ib


def simplex_enum(d, m):
    lib = get_lib()
    from ..ops.simplex import simplex_size
    q = simplex_size(d, m)
    idx = np.zeros((m,)*d, np.int32)
    jdx = np.zeros((q, d), np.int32)
    n = lib.rsx_simplex_enum(d, m, _i32p(idx), _i32p(jdx))
    assert n == q, (n, q)
    return idx, jdx


def _i64p(a):
    import ctypes as _ct
    return a.ctypes.data_as(_ct.POINTER(_ct.c_int64))


class BoundTable:
    """Multiplication table with ctypes pointers bound once, for
    low-overhead repeated host calls (the PolyTrace hot path).

    The table is re-sorted by output coefficient so the kernels
    accumulate each c[o] in a register and store sequentially
    (rsx_mul_grouped) instead of scatter-accumulating."""

    def __init__(self, table):
        self.lib = get_lib()
        out, ia, ib = table
        order = np.argsort(out, kind="stable")
        self.out = np.ascontiguousarray(out[order])
        self.ia = np.ascontiguousarray(ia[order])
        self.ib = np.ascontiguousarray(ib[order])
        self.nterms = self.out.shape[0]
        self.q = int(self.out[-1]) + 1
        self.starts = np.searchsorted(
            self.out, np.arange(self.q + 1)).astype(np.int64)
        self._pia = _i32p(self.ia)
        self._pib = _i32p(self.ib)
        self._pstarts = _i64p(self.starts)

    def mul(self, a, b, q):
        c = np.empty(q, np.float64)
        self.lib.rsx_mul_grouped(self._pia, self._pib, self._pstarts,
                                 q, _f64p(a), _f64p(b), _f64p(c))
        return c

    def pow(self, order, a, p, q):
        z = np.empty(q, np.float64)
        self.lib.rsx_pow_grouped(self._pia, self._pib, self._pstarts,
                                 q, order, _f64p(a), p, _f64p(z))
        return z


def mul(table, a, b):
    lib = get_lib()
    out, ia, ib = table
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    c = np.empty_like(a)
    lib.rsx_mul(_i32p(out), _i32p(ia), _i32p(ib), out.shape[0],
                _f64p(a), _f64p(b), _f64p(c), a.shape[0])
    return c


def pow(table, order, a, p):
    lib = get_lib()
    out, ia, ib = table
    a = np.ascontiguousarray(a, np.float64)
    z = np.empty_like(a)
    lib.rsx_pow(_i32p(out), _i32p(ia), _i32p(ib), out.shape[0],
                int(order), _f64p(a), float(p), _f64p(z), a.shape[0])
    return z


def eval(jdx, a, x):
    lib = get_lib()
    jdx = np.ascontiguousarray(jdx, np.int32)
    a = np.ascontiguousarray(a, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    d, npts = x.shape
    y = np.empty(npts, np.float64)
    lib.rsx_eval(_i32p(jdx), jdx.shape[0], d, _f64p(a), _f64p(x),
                 npts, _f64p(y))
    return y


def rotation_matrix(angle, direction):
    lib = get_lib()
    d = np.ascontiguousarray(direction, np.float64)[:3]
    out = np.empty((3, 3), np.float64)
    lib.rsx_rotation_matrix(float(angle), _f64p(d), _f64p(out))
    return out


def euler_matrix_rxyz(ai, aj, ak):
    lib = get_lib()
    out = np.empty((3, 3), np.float64)
    lib.rsx_euler_matrix_rxyz(float(ai), float(aj), float(ak),
                              _f64p(out))
    return out


def euler_from_matrix_rxyz(m):
    lib = get_lib()
    m = np.ascontiguousarray(m, np.float64)
    out = np.empty(3, np.float64)
    lib.rsx_euler_from_matrix_rxyz(_f64p(m), _f64p(out))
    return tuple(out)
