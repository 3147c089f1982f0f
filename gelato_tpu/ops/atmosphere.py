"""US Standard Atmosphere 1976, vectorized over altitude arrays.

Piecewise layer tables become gather + ``jnp.where`` branches (differentiable
almost everywhere).  Parity: /root/reference/src/Air.cpp:28-111 and
/root/reference/lib/USStandardAtmosphere.py (the runtime uses the C++ one).
"""

import jax.numpy as jnp
import numpy as np

_RSTAR = 8314.32  # universal gas constant [J/(kmol K)]
_G0 = 9.80665
_R0 = 6356766.0  # effective Earth radius for geopotential altitude [m]

# NumPy (not jnp) on purpose: module-level device arrays would initialize
# the JAX backend at import time, before a CLI --cpu re-exec can run.
# Layer base geopotential altitude [m], lapse rate [K/m], base temperature [K],
# base pressure [Pa], molecular weight [kg/kmol]
_HB = np.asarray(
    [0.0, 11000.0, 20000.0, 32000.0, 47000.0, 51000.0, 71000.0, 86000.0, 91000.0, 110000.0, 120000.0]
)
_LMB = np.asarray(
    [-0.0065, 0.0, 0.001, 0.0028, 0.0, -0.0028, -0.002, 0.0, 0.0025, 0.012, 0.012]
)
_TMB = np.asarray(
    [288.15, 216.65, 216.65, 228.65, 270.65, 270.65, 214.65, 186.8673, 186.8673, 240.0, 360.0]
)
_PB = np.asarray(
    [101325.0, 22632.0, 5474.9, 868.02, 110.91, 66.939, 3.9564, 0.37338, 0.15381, 7.1042e-3, 2.5382e-3]
)
_MB = np.asarray(
    [28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9522, 28.89, 27.27, 26.20]
)


def geopotential_altitude(geometric_alt_m):
    """Geometric → geopotential altitude below 86 km; identity above.

    Parity: /root/reference/src/Air.cpp:47-54.
    """
    z = jnp.asarray(geometric_alt_m)
    h = _R0 * z / (_R0 + z)
    return jnp.where(z < 86000.0, h, z)


def _tab(table, k):
    """Gather from a host-side table (tables stay NumPy so importing this
    module never initializes a JAX backend; converted at trace time)."""
    return jnp.asarray(table)[k]


def _layer(h):
    """Index of the atmosphere layer containing geopotential altitude ``h``."""
    # searchsorted(side='right') - 1 reproduces the reference's linear scan
    # "largest k with h >= hb[k]" (Air.cpp:56-61), clamped to the table.
    return jnp.clip(jnp.searchsorted(_HB, h, side="right") - 1, 0, _HB.size - 1)


def airtemperature_at(h):
    """Kinetic temperature [K] at geopotential altitude ``h`` [m].

    Piecewise: linear layers below 91 km, elliptic segment 91-110 km,
    linear 110-120 km, exponential above (parity: Air.cpp:71-88).
    """
    h = jnp.asarray(h)
    k = _layer(h)
    tmb, lmb, hb = _tab(_TMB, k), _tab(_LMB, k), _tab(_HB, k)
    t_linear = tmb + lmb * (h - hb)
    # 91-110 km elliptic segment.  Clamp the sqrt argument to 1 outside the
    # segment so the untaken where-branch cannot emit inf cotangents in
    # reverse-mode AD (0 * inf = NaN).
    a_ell = -19942.9
    in_ell = (h > 91000.0) & (h <= 110000.0)
    ell_arg = jnp.where(in_ell, 1.0 - ((h - 91000.0) / a_ell) ** 2, 1.0)
    t_elliptic = 263.1905 - 76.3232 * jnp.sqrt(jnp.maximum(ell_arg, 1e-12))
    # above 120 km exponential approach to T_inf
    xi = (h - hb) * (_R0 + hb) / (_R0 + h)
    t_exp = 1000.0 - (1000.0 - tmb) * jnp.exp(-0.01875e-3 * xi)
    return jnp.where(
        h <= 91000.0,
        t_linear,
        jnp.where(h <= 110000.0, t_elliptic, jnp.where(h <= 120000.0, t_linear, t_exp)),
    )


def airpressure_at(h):
    """Static pressure [Pa] at geopotential altitude ``h`` [m].

    Barometric formula per layer (parity: Air.cpp:90-98).
    """
    h = jnp.asarray(h)
    k = _layer(h)
    tmb, lmb, hb, pb = (_tab(_TMB, k), _tab(_LMB, k),
                    _tab(_HB, k), _tab(_PB, k))
    R = _RSTAR / _tab(_MB, k)
    # gradient layer: P = Pb * (T/Tb)^(-g0/(L R)); isothermal: exponential.
    # Guard lmb==0 to keep the power branch finite before the where-select.
    lmb_safe = jnp.where(jnp.abs(lmb) > 1e-6, lmb, 1.0)
    p_grad = pb * ((tmb + lmb * (h - hb)) / tmb) ** (-_G0 / lmb_safe / R)
    p_iso = pb * jnp.exp(_G0 / R * (hb - h) / tmb)
    return jnp.where(jnp.abs(lmb) > 1e-6, p_grad, p_iso)


def airdensity_at(h):
    """Density [kg/m3] from the ideal gas law (parity: Air.cpp:100-105)."""
    h = jnp.asarray(h)
    R = _RSTAR / _tab(_MB, _layer(h))
    return airpressure_at(h) / R / airtemperature_at(h)


def speed_of_sound(h):
    """Speed of sound [m/s], γ=1.4 (parity: Air.cpp:107-111)."""
    h = jnp.asarray(h)
    R = _RSTAR / _tab(_MB, _layer(h))
    return jnp.sqrt(1.4 * R * airtemperature_at(h))
