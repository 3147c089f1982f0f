"""Host-side (NumPy, scalar) math used during problem construction.

Problem setup computes a handful of scalar constants (launch-site position,
initial attitude quaternion).  On this TPU stack, f64 transcendentals on
sub-2-element arrays lose ~1e-8 of precision, so setup scalars are computed
on the host instead of through the JAX ops.
"""

import math

import numpy as np

from .ops.earth import WGS84_A, WGS84_E2, OMEGA_EARTH_RPS


def geodetic2ecef(lat_deg, lon_deg, alt_m):
    lat, lon = math.radians(lat_deg), math.radians(lon_deg)
    N = WGS84_A / math.sqrt(1.0 - WGS84_E2 * math.sin(lat) ** 2)
    return np.array(
        [
            (N + alt_m) * math.cos(lat) * math.cos(lon),
            (N + alt_m) * math.cos(lat) * math.sin(lon),
            (N * (1.0 - WGS84_E2) + alt_m) * math.sin(lat),
        ]
    )


def ecef2eci(v, t):
    c, s = math.cos(OMEGA_EARTH_RPS * t), math.sin(OMEGA_EARTH_RPS * t)
    return np.array([v[0] * c - v[1] * s, v[0] * s + v[1] * c, v[2]])


def vel_ecef2eci(vel, pos, t):
    return ecef2eci(vel, t) + np.cross([0.0, 0.0, OMEGA_EARTH_RPS], ecef2eci(pos, t))


def quatmult(q, p):
    return np.array(
        [
            q[0] * p[0] - q[1] * p[1] - q[2] * p[2] - q[3] * p[3],
            q[1] * p[0] + q[0] * p[1] - q[3] * p[2] + q[2] * p[3],
            q[2] * p[0] + q[3] * p[1] + q[0] * p[2] - q[1] * p[3],
            q[3] * p[0] - q[2] * p[1] + q[1] * p[2] + q[0] * p[3],
        ]
    )


def quat_ecef2nedg(pos_ecef):
    x, y, z = pos_ecef
    p = math.sqrt(x * x + y * y)
    theta = math.atan2(z * WGS84_A, p * WGS84_A * math.sqrt(1.0 - WGS84_E2))
    b = WGS84_A * math.sqrt(1.0 - WGS84_E2)
    ep2 = (WGS84_A**2 - b**2) / b**2
    lat = math.atan2(z + ep2 * b * math.sin(theta) ** 3, p - WGS84_E2 * WGS84_A * math.cos(theta) ** 3)
    lon = math.atan2(y, x)
    c_hl, s_hl = math.cos(lon / 2), math.sin(lon / 2)
    c_hp, s_hp = math.cos(lat / 2), math.sin(lat / 2)
    r2 = 2.0**-0.5
    return np.array(
        [
            c_hl * (c_hp - s_hp) * r2,
            s_hl * (c_hp + s_hp) * r2,
            -c_hl * (c_hp + s_hp) * r2,
            s_hl * (c_hp - s_hp) * r2,
        ]
    )


def quat_eci2nedg(pos_eci, t):
    half = 0.5 * OMEGA_EARTH_RPS * t
    q_ie = np.array([math.cos(half), 0.0, 0.0, math.sin(half)])
    pos_ecef = ecef2eci(pos_eci, -t)
    return quatmult(q_ie, quat_ecef2nedg(pos_ecef))


def quat_from_euler(az_deg, el_deg, ro_deg):
    az, el, ro = (math.radians(a) / 2.0 for a in (az_deg, el_deg, ro_deg))
    qz = np.array([math.cos(az), 0.0, 0.0, math.sin(az)])
    qy = np.array([math.cos(el), 0.0, math.sin(el), 0.0])
    qx = np.array([math.cos(ro), math.sin(ro), 0.0, 0.0])
    return quatmult(qz, quatmult(qy, qx))
