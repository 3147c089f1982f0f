"""ctypes bindings for the C++ host runtime (native/libgelato_host.so).

Mirrors the reference's native layer architecturally (C++ kernels behind a
thin Python interface, /root/reference/src/ + CMakeLists.txt) but for the
*host* side only: the accelerator path is pure JAX.  Used as an independent
oracle in tests and for JAX-free post-processing.  Build with
``make -C native``; all entry points raise ``NativeUnavailable`` when the
library is absent so the JAX path never depends on it.
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "native", "libgelato_host.so")


class NativeUnavailable(RuntimeError):
    pass


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise NativeUnavailable(
            f"{_LIB_PATH} not built; run `make -C native`")
    lib = ctypes.CDLL(_LIB_PATH)
    d = ctypes.c_double
    p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64

    lib.gh_geopotential_altitude.restype = d
    lib.gh_geopotential_altitude.argtypes = [d]
    for f in ("gh_temperature", "gh_pressure", "gh_density",
              "gh_speed_of_sound"):
        getattr(lib, f).restype = d
        getattr(lib, f).argtypes = [d]
    lib.gh_atmosphere_batch.argtypes = [p, p, p, p, p, i64]
    lib.gh_geodetic2ecef.argtypes = [d, d, d, p]
    lib.gh_ecef2geodetic.argtypes = [p, p]
    lib.gh_ecef2eci.argtypes = [p, d, p]
    lib.gh_eci2ecef.argtypes = [p, d, p]
    lib.gh_gravity_eci.argtypes = [p, p]
    lib.gh_distance_vincenty.restype = d
    lib.gh_distance_vincenty.argtypes = [d, d, d, d]
    lib.gh_iip_faa.restype = ctypes.c_int
    lib.gh_iip_faa.argtypes = [p, p, p]
    lib.gh_iip_batch.argtypes = [p, p, p, i64]
    _lib = lib
    return lib


def available():
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _as_c(a):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def atmosphere(alt_geometric):
    """(T, P, rho, a) arrays for geometric altitudes [m]."""
    lib = _load()
    alt, alt_p = _as_c(np.atleast_1d(alt_geometric))
    n = alt.size
    out = [np.empty(n) for _ in range(4)]
    ptrs = [o.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for o in out]
    lib.gh_atmosphere_batch(alt_p, *ptrs, n)
    return tuple(out)


def geodetic2ecef(lat, lon, alt):
    lib = _load()
    out = np.empty(3)
    lib.gh_geodetic2ecef(lat, lon, alt,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def ecef2geodetic(pos):
    lib = _load()
    pos, pos_p = _as_c(pos)
    out = np.empty(3)
    lib.gh_ecef2geodetic(pos_p,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def gravity_eci(pos):
    lib = _load()
    pos, pos_p = _as_c(pos)
    out = np.empty(3)
    lib.gh_gravity_eci(pos_p,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def distance_vincenty(lat1, lon1, lat2, lon2):
    return _load().gh_distance_vincenty(lat1, lon1, lat2, lon2)


def iip_faa(pos_ecef, vel_ecef):
    """(lat, lon) degrees, or None when no impact point exists."""
    lib = _load()
    pos, pos_p = _as_c(pos_ecef)
    vel, vel_p = _as_c(vel_ecef)
    out = np.empty(2)
    ok = lib.gh_iip_faa(pos_p, vel_p,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return tuple(out) if ok else None


def iip_batch(pos_ecef, vel_ecef):
    """[N,2] lat/lon degrees with NaN rows where no impact point exists."""
    lib = _load()
    pos, pos_p = _as_c(pos_ecef)
    vel, vel_p = _as_c(vel_ecef)
    n = pos.shape[0]
    out = np.empty((n, 2))
    lib.gh_iip_batch(pos_p, vel_p,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    return out
