"""C¹ table interpolation: piecewise-linear with rounded corners.

The reference interpolates aero/wind tables with plain linear interpolation
(np.interp / wrapper_utils.hpp:51-80), which is only C⁰ — the derivative
jumps at every breakpoint.  Under an exact-Hessian Newton method those moving
kinks make the KKT system inconsistent between iterations and stall the line
search near high-curvature regions (transonic CA, wind shear).  This module
keeps the table semantics but blends each interior corner with a quadratic
over a window w_k = min(adjacent gaps)/4:

    f(x) = linear(x) + Δm_k/(4 w_k) · max(w_k - |x - x_k|, 0)²

which is C¹, coincides with the linear interpolant outside the windows, and
deviates at most Δm_k·w_k/4 at the breakpoint itself.  Fully traceable, so
per-case (batched) tables work under vmap.
"""

import jax.numpy as jnp


def interp1d_c1(x, xp, fp):
    """C¹ interpolation of the table (xp, fp) at x (any shape).

    Flat extrapolation outside the table, like ``jnp.interp``.
    """
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    base = jnp.interp(x, xp, fp)
    if xp.shape[0] < 3:
        return base
    gaps = jnp.diff(xp)
    slopes = jnp.diff(fp) / jnp.maximum(gaps, 1e-300)
    dm = slopes[1:] - slopes[:-1]
    w = jnp.minimum(gaps[:-1], gaps[1:]) / 4.0
    coef = jnp.where(w > 0.0, dm / (4.0 * jnp.maximum(w, 1e-300)), 0.0)
    d = jnp.maximum(w - jnp.abs(x[..., None] - xp[1:-1]), 0.0)
    return base + jnp.sum(coef * d * d, axis=-1)
