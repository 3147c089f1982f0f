"""WGS84 Earth model: geodetic/ECEF/ECI/NED transforms and Vincenty geodesic.

All functions are jittable, batched over leading axes, and AD-compatible.
Parity targets: /root/reference/lib/coordinate.py:103-439,573-588,
/root/reference/src/Earth.cpp:49-154, /root/reference/src/Coordinate.cpp:41-174.
"""

import jax.numpy as jnp

from .quaternion import quatmult, quatconj

# WGS84 constants (reference: /root/reference/src/Earth.hpp, lib/coordinate.py:114-117)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = (WGS84_A**2 - WGS84_B**2) / WGS84_A**2
WGS84_EP2 = (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
OMEGA_EARTH_RPS = 7.2921151467e-5
GM_EARTH = 3.986004418e14


def ecef2geodetic(pos_ecef):
    """ECEF position (..., 3) [m] → geodetic [lat_deg, lon_deg, alt_m].

    Bowring's single-iteration closed form, identical formula to
    /root/reference/lib/coordinate.py:103-128.
    """
    x, y, z = jnp.moveaxis(jnp.asarray(pos_ecef), -1, 0)
    p = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(z * WGS84_A, p * WGS84_B)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    lat = jnp.arctan2(
        z + WGS84_EP2 * WGS84_B * st**3, p - WGS84_E2 * WGS84_A * ct**3
    )
    lon = jnp.arctan2(y, x)
    sl = jnp.sin(lat)
    N = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sl * sl)
    alt = p / jnp.cos(lat) - N
    return jnp.stack([jnp.rad2deg(lat), jnp.rad2deg(lon), alt], axis=-1)


def geodetic2ecef(lat_deg, lon_deg, alt_m):
    """Geodetic [deg, deg, m] → ECEF (..., 3) [m].

    Parity: /root/reference/lib/coordinate.py:131-153.
    """
    lat = jnp.deg2rad(jnp.asarray(lat_deg))
    lon = jnp.deg2rad(jnp.asarray(lon_deg))
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    N = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * sl * sl)
    return jnp.stack(
        [
            (N + alt_m) * cl * jnp.cos(lon),
            (N + alt_m) * cl * jnp.sin(lon),
            (N * (1.0 - WGS84_E2) + alt_m) * sl,
        ],
        axis=-1,
    )


def _earth_rotation(xyz, t, sign):
    """Rotate about +z by sign*ω⊕·t (shared by ecef2eci / eci2ecef)."""
    ang = OMEGA_EARTH_RPS * jnp.asarray(t) * sign
    c, s = jnp.cos(ang), jnp.sin(ang)
    x, y, z = jnp.moveaxis(jnp.asarray(xyz), -1, 0)
    return jnp.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def ecef2eci(xyz, t):
    """ECEF → ECI at time ``t`` from epoch (frames coincide at t=0).

    Parity: /root/reference/lib/coordinate.py:194-214.
    """
    return _earth_rotation(xyz, t, 1.0)


def eci2ecef(xyz, t):
    """ECI → ECEF (parity: /root/reference/lib/coordinate.py:217-237)."""
    return _earth_rotation(xyz, t, -1.0)


def vel_ecef2eci(vel_ecef, pos_ecef, t):
    """Ground velocity in ECEF → inertial velocity in ECI, adding ω⊕×r.

    Parity: /root/reference/lib/coordinate.py:240-258.
    """
    pos_eci = ecef2eci(pos_ecef, t)
    vel_ground_eci = ecef2eci(vel_ecef, t)
    omega = jnp.asarray([0.0, 0.0, OMEGA_EARTH_RPS])
    return vel_ground_eci + jnp.cross(omega, pos_eci)


def vel_eci2ecef(vel_eci, pos_eci, t):
    """Inertial ECI velocity → ground velocity in ECEF, removing ω⊕×r.

    Parity: /root/reference/lib/coordinate.py:261-278.
    """
    omega = jnp.asarray([0.0, 0.0, OMEGA_EARTH_RPS])
    vel_ground_eci = jnp.asarray(vel_eci) - jnp.cross(omega, jnp.asarray(pos_eci))
    return eci2ecef(vel_ground_eci, t)


def quat_eci2ecef(t):
    """Frame quaternion ECI→ECEF (parity: lib/coordinate.py:281-294)."""
    half = 0.5 * OMEGA_EARTH_RPS * jnp.asarray(t)
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def quat_ecef2eci(t):
    """Frame quaternion ECEF→ECI (parity: lib/coordinate.py:297-307)."""
    return quatconj(quat_eci2ecef(t))


def quat_ecef2nedg(pos_ecef):
    """Frame quaternion ECEF → WGS84-geodetic local NED at ``pos_ecef``.

    Parity: /root/reference/lib/coordinate.py:335-359.
    """
    llh = ecef2geodetic(pos_ecef)
    p = jnp.deg2rad(llh[..., 0])
    l = jnp.deg2rad(llh[..., 1])
    c_hl, s_hl = jnp.cos(l / 2.0), jnp.sin(l / 2.0)
    c_hp, s_hp = jnp.cos(p / 2.0), jnp.sin(p / 2.0)
    inv_sqrt2 = 2.0**-0.5
    return jnp.stack(
        [
            c_hl * (c_hp - s_hp) * inv_sqrt2,
            s_hl * (c_hp + s_hp) * inv_sqrt2,
            -c_hl * (c_hp + s_hp) * inv_sqrt2,
            s_hl * (c_hp - s_hp) * inv_sqrt2,
        ],
        axis=-1,
    )


def quat_nedg2ecef(pos_ecef):
    """Inverse of :func:`quat_ecef2nedg` (parity: lib/coordinate.py:362-371)."""
    return quatconj(quat_ecef2nedg(pos_ecef))


def quat_eci2nedg(pos_eci, t):
    """Frame quaternion ECI → local geodetic NED (parity: lib/coordinate.py:386-397)."""
    return quatmult(quat_eci2ecef(t), quat_ecef2nedg(eci2ecef(pos_eci, t)))


def quat_nedg2eci(pos_eci, t):
    """Inverse of :func:`quat_eci2nedg` (parity: lib/coordinate.py:414-425)."""
    return quatconj(quat_eci2nedg(pos_eci, t))


def quat_nedg2body(quat_eci2body, pos_eci, t):
    """Frame quaternion local-NED → body (parity: lib/coordinate.py:488-502)."""
    return quatmult(quatconj(quat_eci2nedg(pos_eci, t)), quat_eci2body)


def eci2geodetic(pos_eci, t):
    """ECI position → geodetic LLH (parity: lib/coordinate.py:573-588)."""
    return ecef2geodetic(eci2ecef(pos_eci, t))


def distance_vincenty(lat1_deg, lon1_deg, lat2_deg, lon2_deg, n_iter=24):
    """Vincenty inverse geodesic distance [m] on the WGS84 ellipsoid.

    Fixed-trip-count fixed-point iteration (the reference iterates up to 5000
    times with an early break at 1e-12, /root/reference/lib/downrange.py:32-111
    and src/Earth.cpp:75-154; convergence is geometric so 24 iterations reach
    machine precision for non-antipodal points).  Coincident/meridian-singular
    points are handled with masked guards so the function is NaN-free under AD.
    """
    lat1 = jnp.deg2rad(jnp.asarray(lat1_deg))
    lon1 = jnp.deg2rad(jnp.asarray(lon1_deg))
    lat2 = jnp.deg2rad(jnp.asarray(lat2_deg))
    lon2 = jnp.deg2rad(jnp.asarray(lon2_deg))
    f = WGS84_F

    U1 = jnp.arctan((1.0 - f) * jnp.tan(lat1))
    U2 = jnp.arctan((1.0 - f) * jnp.tan(lat2))
    dlon = lon2 - lon1
    sU1, cU1 = jnp.sin(U1), jnp.cos(U1)
    sU2, cU2 = jnp.sin(U2), jnp.cos(U2)

    def body(lam, _):
        s_lam, c_lam = jnp.sin(lam), jnp.cos(lam)
        sin_sigma = jnp.sqrt(
            jnp.maximum(
                (cU2 * s_lam) ** 2 + (cU1 * sU2 - sU1 * cU2 * c_lam) ** 2, 1e-30
            )
        )
        cos_sigma = sU1 * sU2 + cU1 * cU2 * c_lam
        sigma = jnp.arctan2(sin_sigma, cos_sigma)
        sin_alpha = cU1 * cU2 * s_lam / sin_sigma
        cos2_alpha = jnp.maximum(1.0 - sin_alpha**2, 1e-30)
        cos_2sm = cos_sigma - 2.0 * sU1 * sU2 / cos2_alpha
        C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_new = dlon + (1.0 - C) * f * sin_alpha * (
            sigma
            + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1.0 + 2.0 * cos_2sm**2))
        )
        return lam_new, (sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sm)

    lam = dlon
    aux = None
    for _ in range(n_iter):
        lam, aux = body(lam, aux)
    sin_sigma, cos_sigma, sigma, cos2_alpha, cos_2sm = aux

    u2 = cos2_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    Bc = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    delta_sigma = (
        Bc
        * sin_sigma
        * (
            cos_2sm
            + 0.25
            * Bc
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm**2)
                - Bc / 6.0 * cos_2sm * (-3.0 + 4.0 * sin_sigma**2) * (-3.0 + 4.0 * cos_2sm**2)
            )
        )
    )
    dist = WGS84_B * A * (sigma - delta_sigma)
    # The reference returns exactly 0 for dlon == 0 (downrange.py:44-45); keep
    # that behaviour only for truly coincident points to stay smooth elsewhere.
    coincident = (jnp.abs(dlon) < 1e-15) & (jnp.abs(lat1 - lat2) < 1e-15)
    return jnp.where(coincident, 0.0, dist)
