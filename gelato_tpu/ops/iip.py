"""FAA instantaneous impact point (IIP) on the WGS84 ellipsoid.

Kepler f/g-series fixed-point iteration with a *fixed* trip count and
where-masked early-outs, so the kernel is jittable, vmappable and
differentiable (parity: /root/reference/src/iip.cpp:36-150 and the wrapper
/root/reference/src/pybind_IIP.cpp:34-51).
"""

import jax.numpy as jnp

from .earth import (
    WGS84_A,
    WGS84_B,
    WGS84_E2,
    GM_EARTH,
    OMEGA_EARTH_RPS,
    ecef2eci,
    vel_ecef2eci,
)


def posLLH_IIP_FAA(pos_ecef, vel_ecef, fill_na=True, n_iter=5):
    """IIP [lat_deg, lon_deg, 0] for ECEF state(s); NaN (or 0) when no solution.

    The four "no impact point" early-outs of the FAA algorithm (below surface,
    non-elliptic, positive perigee, non-intersecting) become a validity mask;
    masked lanes carry safe dummy values through the fixed 5-iteration loop.
    ``fill_na=True`` returns zeros for invalid lanes, ``False`` returns NaN
    (matching pybind_IIP.cpp:38-44).
    """
    pos_eci = ecef2eci(pos_ecef, 0.0)
    vel_eci = vel_ecef2eci(vel_ecef, pos_ecef, 0.0)

    r0 = jnp.linalg.norm(pos_eci, axis=-1)
    v0 = jnp.linalg.norm(vel_eci, axis=-1)

    valid = r0 >= WGS84_B  # (v)-(B): above the surface
    eps_cos = r0 * v0 * v0 / GM_EARTH - 1.0
    valid &= eps_cos < 1.0  # (v)-(E): elliptic trajectory
    # Semi-major axis; guard the division for masked lanes.
    a_t = r0 / jnp.maximum(1.0 - eps_cos, 1e-12)
    eps_sin = jnp.sum(pos_eci * vel_eci, axis=-1) / jnp.sqrt(
        jnp.maximum(GM_EARTH * a_t, 1e-12)
    )
    eps2 = eps_cos * eps_cos + eps_sin * eps_sin
    eps = jnp.sqrt(eps2)
    # (v)-(H): perigee below the surface, otherwise no impact
    valid &= ~((eps <= 1.0) & (a_t * (1.0 - eps) - WGS84_A >= 0.0))

    eps2_safe = jnp.maximum(eps2, 1e-30)

    r_k1 = jnp.broadcast_to(jnp.asarray(WGS84_B), r0.shape)
    # Loop state that must survive the fixed-count iteration
    d_cos = jnp.zeros_like(r0)
    d_sin = jnp.zeros_like(r0)
    eps_k_sin = jnp.zeros_like(r0)
    Ek = jnp.zeros_like(r0)
    Fk = jnp.zeros_like(r0)
    Gk = jnp.zeros_like(r0)
    r_prev = r_k1

    for _ in range(n_iter):
        eps_k_cos = (a_t - r_k1) / a_t
        disc = eps2 - eps_k_cos * eps_k_cos
        valid &= disc >= 0.0  # (v)-(J): orbit intersects the surface
        eps_k_sin = -jnp.sqrt(jnp.maximum(disc, 0.0))
        d_cos = (eps_k_cos * eps_cos + eps_k_sin * eps_sin) / eps2_safe
        d_sin = (eps_k_sin * eps_cos - eps_k_cos * eps_sin) / eps2_safe
        f2 = (d_cos - eps_cos) / jnp.maximum(1.0 - eps_cos, 1e-12)
        g2 = (d_sin + eps_sin - eps_k_sin) * jnp.sqrt(a_t**3 / GM_EARTH)
        Ek = f2 * pos_eci[..., 0] + g2 * vel_eci[..., 0]
        Fk = f2 * pos_eci[..., 1] + g2 * vel_eci[..., 1]
        Gk = f2 * pos_eci[..., 2] + g2 * vel_eci[..., 2]
        r_k2 = WGS84_A / jnp.sqrt(
            (WGS84_E2 / (1.0 - WGS84_E2)) * (Gk / r_k1) ** 2 + 1.0
        )
        r_prev = r_k1
        r_k1 = r_k2

    valid &= jnp.abs(r_prev - r_k1) <= 1.0  # (v)-(Q): convergence check

    delta_eps = jnp.arctan2(d_sin, d_cos)
    time_sec = (delta_eps + eps_sin - eps_k_sin) * jnp.sqrt(a_t**3 / GM_EARTH)
    sin_phi = jnp.clip(Gk / jnp.maximum(r_k1, 1e-12), -1.0, 1.0)
    phi_gc = jnp.arcsin(sin_phi)
    phi = jnp.arctan2(jnp.tan(phi_gc), 1.0 - WGS84_E2)  # geodetic latitude
    lam = jnp.arctan2(Fk, Ek) - OMEGA_EARTH_RPS * time_sec

    lat_deg = jnp.rad2deg(phi)
    lon_deg = jnp.rad2deg(lam)
    fill = 0.0 if fill_na else jnp.nan
    out = jnp.stack(
        [
            jnp.where(valid, lat_deg, fill),
            jnp.where(valid, lon_deg, fill),
            jnp.zeros_like(lat_deg) if fill_na else jnp.where(valid, 0.0, jnp.nan),
        ],
        axis=-1,
    )
    return out
