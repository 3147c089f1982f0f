"""Orbital mechanics helpers: elements, energy, angular momentum.

Parity: /root/reference/lib/coordinate.py:591-745 and
/root/reference/src/wrapper_coordinate.hpp:197-265.
"""

import jax.numpy as jnp

from .earth import GM_EARTH
from .quaternion import normalize

_R_EARTH_EQ = 6378137.0


def angular_momentum_vec(r, v):
    """Specific angular momentum vector r × v (lib/coordinate.py:652-660)."""
    return jnp.cross(r, v)


def angular_momentum(r, v):
    """|r × v| (lib/coordinate.py:663-671)."""
    return jnp.linalg.norm(angular_momentum_vec(r, v), axis=-1)


def inclination_cosine(r, v):
    """cos(i) = h_z / |h| (lib/coordinate.py:674-682)."""
    h = angular_momentum_vec(r, v)
    return h[..., 2] / jnp.linalg.norm(h, axis=-1)


def inclination_rad(r, v):
    """Inclination [rad] (lib/coordinate.py:685-693)."""
    return jnp.arccos(jnp.clip(inclination_cosine(r, v), -1.0, 1.0))


def laplace_vector(r, v):
    """Laplace (eccentricity·μ) vector (lib/coordinate.py:696-705)."""
    h = angular_momentum_vec(r, v)
    return jnp.cross(v, h) - GM_EARTH * normalize(r)


def orbit_energy(r, v):
    """Specific orbital energy v²/2 − μ/r (lib/coordinate.py:708-716)."""
    return 0.5 * jnp.sum(v * v, axis=-1) - GM_EARTH / jnp.linalg.norm(r, axis=-1)


def angular_momentum_from_altitude(ha, hp):
    """Target |h| for a (perigee, apogee) altitude pair (lib/coordinate.py:719-731)."""
    ra = _R_EARTH_EQ + ha
    rp = _R_EARTH_EQ + hp
    a = (ra + rp) / 2.0
    vp = jnp.sqrt(GM_EARTH * (2.0 / rp - 1.0 / a))
    return rp * vp


def orbit_energy_from_altitude(ha, hp):
    """Target energy −μ/2a for an altitude pair (lib/coordinate.py:734-745)."""
    a = (_R_EARTH_EQ + ha + _R_EARTH_EQ + hp) / 2.0
    return -GM_EARTH / 2.0 / a


def orbital_elements(r_eci, v_eci):
    """Classical orbital elements [a, e, i_deg, Ω_deg, ω_deg, ν_deg].

    Parity: /root/reference/lib/coordinate.py:591-649, with the singular
    branches (equatorial orbit) folded into where-masks.
    """
    nr = normalize(r_eci, eps=1e-30)
    c = jnp.cross(r_eci, v_eci)
    f = jnp.cross(v_eci, c) - GM_EARTH * nr
    c1 = normalize(c, eps=1e-30)
    f1 = normalize(f, eps=1e-30)

    inc = jnp.arccos(jnp.clip(c1[..., 2], -1.0, 1.0))
    equatorial = inc <= 1e-10

    raan = jnp.where(equatorial, 0.0, jnp.arctan2(c1[..., 0], -c1[..., 1]))
    n_vec = jnp.stack(
        [jnp.cos(raan), jnp.sin(raan), jnp.zeros_like(raan)], axis=-1
    )
    argp_incl = jnp.arccos(
        jnp.clip(
            n_vec[..., 0] * f1[..., 0] + n_vec[..., 1] * f1[..., 1], -1.0, 1.0
        )
    )
    argp_incl = jnp.where(f[..., 2] < 0.0, -argp_incl, argp_incl)
    argp_eq = jnp.arctan2(f[..., 1], f[..., 0])
    argp = jnp.where(equatorial, argp_eq, argp_incl)

    p = jnp.sum(c * c, axis=-1) / GM_EARTH
    e = jnp.linalg.norm(f, axis=-1) / GM_EARTH
    a = p / jnp.maximum(1.0 - e * e, 1e-30)

    nu = jnp.arccos(jnp.clip(jnp.sum(f1 * nr, axis=-1), -1.0, 1.0))
    nu = jnp.where(jnp.sum(v_eci * r_eci, axis=-1) < 0.0, 2.0 * jnp.pi - nu, nu)

    two_pi = 2.0 * jnp.pi
    raan = jnp.where(raan < 0.0, raan + two_pi, raan)
    argp = jnp.where(argp < 0.0, argp + two_pi, argp)
    nu = jnp.where(nu < 0.0, nu + two_pi, nu)

    return jnp.stack(
        [a, e, jnp.rad2deg(inc), jnp.rad2deg(raan), jnp.rad2deg(argp), jnp.rad2deg(nu)],
        axis=-1,
    )
