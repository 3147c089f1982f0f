"""User-constraint plug-in for the bundled example mission (JAX-native).

Equivalent of /root/reference/example/user_constraints.py:120-154 under the
gelato_tpu plug-in API: constrain the orbit of the IIP_END knot state so its
perigee radius equals one Earth equatorial radius (stage-disposal condition).
The reference computes a(1-e)/Re - 1 from orbital elements; this is the same
quantity expressed through energy/momentum (smooth, AD-friendly):

    a (1 - e) = p / (1 + e),  p = c^2/mu,  e = sqrt(1 + 2 E c^2 / mu^2)
"""

import jax.numpy as jnp

GM = 3.986004418e14
RE = 6378137.0


def equality_user(ctx):
    pos = ctx.value("IIP_END", "position")
    vel = ctx.value("IIP_END", "velocity")
    c2 = jnp.sum(jnp.cross(pos, vel) ** 2)
    energy = 0.5 * jnp.sum(vel * vel) - GM / jnp.linalg.norm(pos)
    ecc = jnp.sqrt(jnp.maximum(1.0 + 2.0 * energy * c2 / GM**2, 0.0))
    r_perigee = (c2 / GM) / (1.0 + ecc)
    return r_perigee / RE - 1.0


def inequality_user(ctx):
    return None
