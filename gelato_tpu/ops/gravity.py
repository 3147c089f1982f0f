"""Earth gravity models.

:func:`gravityECI` is the WGS84/EGM96 C̄₂₀ model the reference actually runs
(src/gravity.cpp:11-57, called from the C++ dynamics kernel); :func:`gravity_j2`
is the JGM-3 J2 variant of the pure-Python mirror (lib/coordinate.py:460-485),
kept for cross-checks.
"""

import jax.numpy as jnp

from .earth import WGS84_A, WGS84_B, GM_EARTH

_BARC20 = -0.484165371736e-3  # normalized C̄₂₀
_SQRT5 = 5.0**0.5


def gravityECI(pos):
    """Gravity acceleration [m/s²] at ECI (or ECEF) position(s) (..., 3).

    Zonal harmonic C̄₂₀ only; radius clamped to the polar radius below ground
    (parity: /root/reference/src/gravity.cpp:11-57).
    """
    pos = jnp.asarray(pos)
    r = jnp.linalg.norm(pos, axis=-1, keepdims=True)
    r_safe = jnp.maximum(r, 1e-9)
    ir = pos / r_safe
    irz = ir[..., 2:3]
    barP20 = _SQRT5 * (3.0 * irz * irz - 1.0) * 0.5
    barP20d = _SQRT5 * 3.0 * irz
    rc = jnp.maximum(r, WGS84_B)  # clamp below-ground radius
    a_r2 = (WGS84_A / rc) ** 2
    g_ir = -GM_EARTH / (rc * rc) * (1.0 + _BARC20 * a_r2 * (3.0 * barP20 + irz * barP20d))
    g_iz = GM_EARTH / (rc * rc) * a_r2 * _BARC20 * barP20d
    z_hat = jnp.zeros_like(pos).at[..., 2].set(1.0)
    return g_ir * ir + g_iz * z_hat


def gravity_j2(pos):
    """JGM-3 J2 gravity of the pure-Python mirror (lib/coordinate.py:460-485)."""
    pos = jnp.asarray(pos)
    x, y, z = jnp.moveaxis(pos, -1, 0)
    J2 = 1.082628e-3
    r = jnp.linalg.norm(pos, axis=-1)
    p2 = x * x + y * y
    a2 = WGS84_A**2
    fx = GM_EARTH * (-x / r**3 + J2 * a2 * x / r**7 * (6.0 * z * z - 1.5 * p2))
    fy = GM_EARTH * (-y / r**3 + J2 * a2 * y / r**7 * (6.0 * z * z - 1.5 * p2))
    fz = GM_EARTH * (-z / r**3 + J2 * a2 * z / r**7 * (3.0 * z * z - 4.5 * p2))
    return jnp.stack([fx, fy, fz], axis=-1)
