"""Air-relative flight quantities: wind lookup, angle of attack, dynamic pressure.

Single-node functions designed for ``jax.vmap`` over node axes — replacing the
scalar C++ loops and their hand-written "array versions"
(parity: /root/reference/src/wrapper_utils.hpp:82-206, lib/utils.py:83-207).
"""

import jax.numpy as jnp

from .interp import interp1d_c1
from .quaternion import quatrot, normalize
from .earth import ecef2eci, eci2ecef, vel_eci2ecef, ecef2geodetic, quat_nedg2eci
from .atmosphere import geopotential_altitude, airdensity_at


def wind_ned(altitude_m, wind_table):
    """NED wind vector by linear interpolation of the (alt, wind_n, wind_e) table.

    Parity: /root/reference/lib/utils.py:83-89 (down component always 0),
    with C¹ corner smoothing (ops.interp) for Newton-friendly derivatives.
    """
    wn = interp1d_c1(altitude_m, wind_table[:, 0], wind_table[:, 1])
    we = interp1d_c1(altitude_m, wind_table[:, 0], wind_table[:, 2])
    return jnp.stack([wn, we, jnp.zeros_like(wn)], axis=-1)


def vel_air_eci(pos_eci, vel_eci, t, wind_table):
    """Air-relative velocity in ECI and the geopotential altitude.

    Shared preamble of every aero quantity (the reference recomputes it in each
    of dynamics/AOA/q; here it is a single fused function the compiler can CSE).
    Returns ``(vel_air_eci, altitude_m)``.
    """
    llh = ecef2geodetic(eci2ecef(pos_eci, t))
    altitude = geopotential_altitude(llh[..., 2])
    vel_ecef = vel_eci2ecef(vel_eci, pos_eci, t)
    vw_ned = wind_ned(altitude, wind_table)
    vw_eci = quatrot(quat_nedg2eci(pos_eci, t), vw_ned)
    return ecef2eci(vel_ecef, t) - vw_eci, altitude


def angle_of_attack_all_rad(pos_eci, vel_eci, quat, t, wind_table):
    """Total angle of attack [rad] between body x-axis and airspeed.

    Parity: /root/reference/lib/utils.py:92-121 (returns 0 when the airspeed is
    tiny or aligned; implemented with smooth clipping + where-masks).
    """
    va, _ = vel_air_eci(pos_eci, vel_eci, t, wind_table)
    thrust_dir = normalize(quatrot_inv_x(quat), eps=1e-30)
    va_norm = jnp.linalg.norm(va, axis=-1)
    c_alpha = jnp.sum(normalize(va, eps=1e-30) * thrust_dir, axis=-1)
    alpha = jnp.arccos(jnp.clip(c_alpha, -1.0, 1.0))
    return jnp.where((c_alpha >= 1.0) | (va_norm < 0.001), 0.0, alpha)


def quatrot_inv_x(quat):
    """Body x-axis expressed in ECI: conj(q) rotation of [1,0,0].

    Closed form of quatrot(conj(q), e_x), avoiding the full rotation.
    """
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    return jnp.stack(
        [
            w * w + x * x - y * y - z * z,
            2.0 * (x * y + w * z),
            2.0 * (x * z - w * y),
        ],
        axis=-1,
    )


def angle_of_attack_ab_rad(pos_eci, vel_eci, quat, t, wind_table):
    """Pitch/yaw angles of attack [rad] (stacked last axis: [alpha_z, alpha_y]).

    Parity: /root/reference/lib/utils.py:132-161.
    """
    va, _ = vel_air_eci(pos_eci, vel_eci, t, wind_table)
    va_body = quatrot(quat, va)
    small = va_body[..., 0] < 0.001
    denom = jnp.where(small, 1.0, va_body[..., 0])
    alpha_z = jnp.where(small, 0.0, jnp.arctan2(va_body[..., 2], denom))
    alpha_y = jnp.where(small, 0.0, jnp.arctan2(va_body[..., 1], denom))
    return jnp.stack([alpha_z, alpha_y], axis=-1)


def dynamic_pressure_pa(pos_eci, vel_eci, t, wind_table):
    """Dynamic pressure 0.5 ρ |v_air|² [Pa] (parity: lib/utils.py:164-184)."""
    va, altitude = vel_air_eci(pos_eci, vel_eci, t, wind_table)
    rho = airdensity_at(altitude)
    return 0.5 * jnp.sum(va * va, axis=-1) * rho


def q_alpha_pa_rad(pos_eci, vel_eci, quat, t, wind_table):
    """Q·α [Pa·rad] (parity: lib/utils.py:195-199)."""
    return dynamic_pressure_pa(pos_eci, vel_eci, t, wind_table) * angle_of_attack_all_rad(
        pos_eci, vel_eci, quat, t, wind_table
    )
