"""3DoF rocket dynamics: single-node rates designed for vmap over node stacks.

TPU-native equivalent of the reference's hot C++ kernel
(/root/reference/src/pybind_dynamics.cpp:30-106) and of the initial-guess EOM
(/root/reference/initialize.py:37-111).  One fused code path covers both the
"air" and "NoAir" variants: sections with ``reference_area == 0`` get zero
aero force *and* no nozzle backpressure, exactly reproducing the reference's
branch selection (lib/con_dynamics.py:257-286).
"""

import jax.numpy as jnp

from .ops.aero import vel_air_eci, quatrot_inv_x
from .ops.interp import interp1d_c1
from .ops.atmosphere import airdensity_at, airpressure_at, speed_of_sound
from .ops.gravity import gravityECI
from .ops.quaternion import quatmult, normalize

_DEG2RAD = jnp.pi / 180.0


def acceleration_eci(mass, pos_eci, vel_eci, quat, t, thrust_vac, air_area,
                     nozzle_area, wind_table, ca_table):
    """Inertial acceleration [m/s²] of one node (vmap over leading axes).

    Parity: src/pybind_dynamics.cpp:30-92.  ``air_area == 0`` reproduces
    ``dynamics_velocity_NoAir`` (no aero, no backpressure correction).
    """
    va, altitude = vel_air_eci(pos_eci, vel_eci, t, wind_table)
    rho = airdensity_at(altitude)
    p_amb = airpressure_at(altitude)
    mach = jnp.linalg.norm(va, axis=-1) / speed_of_sound(altitude)
    ca = interp1d_c1(mach, ca_table[:, 0], ca_table[:, 1])

    has_air = air_area != 0.0
    aero = (
        0.5 * rho * air_area * ca * jnp.linalg.norm(va, axis=-1)
    )[..., None] * (-va)
    aero = jnp.where(has_air, aero, 0.0)

    thrust = thrust_vac - jnp.where(has_air, nozzle_area * p_amb, 0.0)
    thrust_dir = quatrot_inv_x(quat)
    grav = gravityECI(pos_eci)
    return (thrust[..., None] * thrust_dir + aero) / mass[..., None] + grav


def quaternion_rate(quat, u_pitch_yaw):
    """Attitude kinematics q̇ = ½ q ⊗ [0, 0, u_p, u_y]·π/180.

    ``u_pitch_yaw`` is the [pitch, yaw] body rate in deg/s
    (parity: src/pybind_dynamics.cpp:94-106).
    """
    zeros = jnp.zeros_like(u_pitch_yaw[..., :1])
    omega = jnp.concatenate([zeros, zeros, u_pitch_yaw], axis=-1) * _DEG2RAD
    return 0.5 * quatmult(quat, omega)


def state_rate(x, u3, t, thrust_vac, massflow, air_area, nozzle_area,
               zero_lift_turn, wind_table, ca_table):
    """Full 11-state rate [ṁ, ṙ, v̇, q̇] for the forward simulator.

    ``u3`` is [roll, pitch, yaw] rate in deg/s; ``zero_lift_turn`` switches the
    thrust direction to the airspeed direction
    (parity: /root/reference/initialize.py:37-111).
    """
    mass = x[0]
    pos = x[1:4]
    vel = x[4:7]
    quat = x[7:11]

    va, altitude = vel_air_eci(pos, vel, t, wind_table)
    rho = airdensity_at(altitude)
    p_amb = airpressure_at(altitude)
    va_norm = jnp.linalg.norm(va)
    mach = va_norm / speed_of_sound(altitude)
    ca = interp1d_c1(mach, ca_table[:, 0], ca_table[:, 1])

    aero = 0.5 * rho * va_norm * (-va) * air_area * ca
    thrust = thrust_vac - nozzle_area * p_amb
    thrust_dir = jnp.where(
        zero_lift_turn, va / jnp.maximum(va_norm, 1e-9), quatrot_inv_x(quat)
    )
    acc = gravityECI(pos) + (thrust * thrust_dir + aero) / mass

    omega = jnp.concatenate([jnp.zeros(1), u3]) * _DEG2RAD
    d_quat = 0.5 * quatmult(quat, omega)

    return jnp.concatenate([jnp.asarray([-massflow]), vel, acc, d_quat])


def zerolift_turn_correct(x, t, wind_table):
    """Re-align the body frame with the airspeed direction, zero roll.

    Parity: /root/reference/initialize.py:182-221.
    """
    pos = x[1:4]
    vel = x[4:7]
    va, _ = vel_air_eci(pos, vel, t, wind_table)
    xb = normalize(va, eps=1e-30)
    yb = normalize(jnp.cross(va, pos), eps=1e-30)
    zb = jnp.cross(xb, yb)
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + xb[0] + yb[1] + zb[2], 1e-30))
    k = 0.25 / w
    q = jnp.stack(
        [w, k * (yb[2] - zb[1]), k * (zb[0] - xb[2]), k * (xb[1] - yb[0])]
    )
    return normalize(q)
