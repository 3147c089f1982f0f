"""Reference-API compatibility: run GELATO-style ``user_constraints.py``
plug-ins unmodified.

The reference imports a user module with functions
``equality_user(xdict, pdict, unitdict, condition)`` /
``inequality_user(...)`` (/root/reference/Trajectory_Optimization.py:42,
example at /root/reference/example/user_constraints.py:120-154) whose bodies
slice flat NumPy variable blocks (via ``lib.usercon_tools`` helpers) and call
the compiled ``lib.*_c`` kernels.  This module provides:

* an importable ``lib`` shim whose ``coordinate_c`` / ``utils_c`` / ``IIP_c``
  / ``USStandardAtmosphere_c`` submodules are backed by ``gelato_tpu.ops``
  (pure JAX, differentiable — the plug-in's Jacobian comes from AD instead of
  the reference's dense FD ``jac_fd``);
* ``adapt_reference_user_module(path, problem, condition)``: loads such a
  module and wraps its functions into the native ``UserContext`` signature so
  ``Problem(user_equality=..., user_inequality=...)`` accepts them.

Plug-ins that only use Python arithmetic, slicing, and ``lib.*_c`` calls on
the variables trace cleanly under jit/AD (the bundled example does); direct
``np.<ufunc>(variables)`` calls must be changed to ``jnp`` — documented
limitation of tracing, not of the adapter.
"""

import importlib.util
import sys
import types

import jax.numpy as jnp

from .ops import aero, atmosphere, earth, gravity, iip, orbital, quaternion


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def build_lib_shim():
    """An in-memory ``lib`` package mirroring the reference's compiled
    modules (names per /root/reference/src/pybind_*.cpp bindings)."""
    coordinate_c = _module(
        "lib.coordinate_c",
        quatmult=quaternion.quatmult,
        conj=quaternion.quatconj,
        normalize=quaternion.normalize,
        quatrot=quaternion.quatrot,
        dcm_from_quat=quaternion.dcm_from_quat,
        quat_from_dcm=quaternion.quat_from_dcm,
        quat_from_euler=quaternion.quat_from_euler,
        euler_from_quat=quaternion.euler_from_quat,
        ecef2geodetic=earth.ecef2geodetic,
        geodetic2ecef=earth.geodetic2ecef,
        ecef2eci=earth.ecef2eci,
        eci2ecef=earth.eci2ecef,
        vel_ecef2eci=earth.vel_ecef2eci,
        vel_eci2ecef=earth.vel_eci2ecef,
        quat_eci2ecef=earth.quat_eci2ecef,
        quat_ecef2eci=earth.quat_ecef2eci,
        quat_ecef2nedg=earth.quat_ecef2nedg,
        quat_nedg2ecef=earth.quat_nedg2ecef,
        quat_eci2nedg=earth.quat_eci2nedg,
        quat_nedg2eci=earth.quat_nedg2eci,
        quat_nedg2body=earth.quat_nedg2body,
        eci2geodetic=earth.eci2geodetic,
        gravity=gravity.gravityECI,
        orbital_elements=orbital.orbital_elements,
        distance_vincenty=earth.distance_vincenty,
        angular_momentum_vec=orbital.angular_momentum_vec,
        angular_momentum=orbital.angular_momentum,
        inclination_rad=orbital.inclination_rad,
        inclination_cosine=orbital.inclination_cosine,
        laplace_vector=orbital.laplace_vector,
        orbit_energy=orbital.orbit_energy,
        angular_momentum_from_altitude=orbital.angular_momentum_from_altitude,
        orbit_energy_from_altitude=orbital.orbit_energy_from_altitude,
    )
    utils_c = _module(
        "lib.utils_c",
        wind_ned=aero.wind_ned,
        angle_of_attack_all_rad=aero.angle_of_attack_all_rad,
        angle_of_attack_ab_rad=aero.angle_of_attack_ab_rad,
        dynamic_pressure_pa=aero.dynamic_pressure_pa,
        q_alpha_pa_rad=aero.q_alpha_pa_rad,
        # the *_array_* variants are the same vmap-ready functions
        angle_of_attack_all_array_rad=aero.angle_of_attack_all_rad,
        angle_of_attack_ab_array_rad=aero.angle_of_attack_ab_rad,
        dynamic_pressure_array_pa=aero.dynamic_pressure_pa,
        q_alpha_array_pa_rad=aero.q_alpha_pa_rad,
    )
    iip_c = _module("lib.IIP_c", posLLH_IIP_FAA=iip.posLLH_IIP_FAA)
    atmo_c = _module(
        "lib.USStandardAtmosphere_c",
        geopotential_altitude=atmosphere.geopotential_altitude,
        airtemperature_at=atmosphere.airtemperature_at,
        airpressure_at=atmosphere.airpressure_at,
        airdensity_at=atmosphere.airdensity_at,
        speed_of_sound=atmosphere.speed_of_sound,
    )
    lib = _module("lib", coordinate_c=coordinate_c, utils_c=utils_c,
                  IIP_c=iip_c, USStandardAtmosphere_c=atmo_c)
    lib.__path__ = []  # mark as package so "from lib.x import y" works
    return {
        "lib": lib,
        "lib.coordinate_c": coordinate_c,
        "lib.utils_c": utils_c,
        "lib.IIP_c": iip_c,
        "lib.USStandardAtmosphere_c": atmo_c,
    }


class _PSParamsShim:
    """Duck-type of the reference ``PSparams``
    (/root/reference/lib/SectionParameters.py:30-114) over a SectionStack."""

    def __init__(self, ps):
        self._ps = ps

    def get_index(self, i):
        return self._ps.get_index(i)

    def index_start_u(self, i):
        return self._ps.get_index(i)[0]

    def index_start_x(self, i):
        return self._ps.get_index(i)[2]

    def time_nodes(self, i, to, tf):
        n = self._ps.num_nodes[i]
        tau = self._ps.tau[i, :n]
        return tau * (tf - to) / 2.0 + (tf + to) / 2.0

    def __getitem__(self, i):
        ua, ub, xa, xb, n = self._ps.get_index(i)
        return {
            "nodes": n,
            "tau": self._ps.tau[i, :n],
            "index_start": ua,
            "D": self._ps.D[i, :n, : n + 1],
            "weight": self._ps.weights[i, :n],
        }

    def __len__(self):
        return self._ps.S


def reference_dicts(problem, z):
    """(xdict, pdict, unitdict, condition) views of a flat variable vector —
    exactly the structures the reference hands its user plug-ins
    (Trajectory_Optimization.py:116-177 builds them; shapes per addVarGroup
    at :318-352: all blocks flat)."""
    v = problem.unpack(z)
    un = problem.units
    xdict = {
        "mass": v.mass,
        "position": jnp.ravel(v.pos),
        "velocity": jnp.ravel(v.vel),
        "quaternion": jnp.ravel(v.quat),
        "u": jnp.ravel(v.u),
        "t": v.t,
    }
    unitdict = {
        "mass": un.mass, "position": un.position, "velocity": un.velocity,
        "u": un.u, "t": un.t,
    }
    ev = problem.mission.events
    pdict = {
        "event_index": dict(ev.index),
        "ps_params": _PSParamsShim(problem.ps),
        "params": [{"name": name} for name in ev.names],
        "num_sections": problem.S,
        "M": problem.M,
        "N": problem.N,
    }
    condition = problem.mission.settings
    return xdict, pdict, unitdict, condition


def load_reference_user_module(path):
    """Import a reference-style user_constraints.py with the lib shim
    installed (so its ``from lib.coordinate_c import ...`` lines resolve)."""
    shim = build_lib_shim()
    saved = {k: sys.modules.get(k) for k in shim}
    sys.modules.update(shim)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_user_constraints", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return mod


def adapt_reference_user_module(path):
    """(equality_fn, inequality_fn) in the native UserContext API, wrapping a
    reference-style plug-in file.  Returns (None, None) entries for functions
    the module does not define or that return None."""
    mod = load_reference_user_module(path)

    def wrap(fn):
        if fn is None:
            return None

        def native(ctx):
            xdict, pdict, unitdict, condition = reference_dicts(
                ctx._p, ctx._p.pack(ctx._v.mass, ctx._v.pos, ctx._v.vel,
                                    ctx._v.quat, ctx._v.u, ctx._v.t))
            out = fn(xdict, pdict, unitdict, condition)
            if out is None:
                return None
            return jnp.atleast_1d(jnp.asarray(out))

        return native

    return (wrap(getattr(mod, "equality_user", None)),
            wrap(getattr(mod, "inequality_user", None)))
