"""Waypoint / IIP / antenna constraint *value* parity.

Round-1 validated these groups only by row counts; here a mission configured
with every waypoint row type (lat/lon/altitude/downrange × exact/min/max,
IIP lat/lon × exact/min/max, antenna elevation) is assembled and the
residual *values* are compared against the independent scalar oracle
(tests/reference_impl.py), reproducing the reference's normalizations
(lib/con_waypoint.py:45-105, 164-207, 330-381, 507-559, 717-783).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import reference_impl as ref  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu import initial_guess as ig  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SETTINGS), reason="reference example data not available"
)

WP_EVENT = "MECO"  # a mid-flight section-start knot
ANT_EVENT = "SEIG"

TARGETS = dict(lat=28.0, lon=-80.0, altitude=150e3, downrange=300e3,
               lat_IIP=27.0, lon_IIP=-60.0)


@pytest.fixture(scope="module")
def setup():
    mission = load_mission(SETTINGS)
    names = mission.events.names
    assert WP_EVENT in names and ANT_EVENT in names
    wp = {}
    for key, val in TARGETS.items():
        wp[key] = {"exact": val, "min": val * 0.9, "max": val * 1.1}
    mission.flight_constraint["waypoint"] = {WP_EVENT: wp}
    mission.flight_constraint["antenna"] = {
        "gs1": {
            "lat": 26.0, "lon": -81.0, "altitude": 20.0,
            "elevation_min": {ANT_EVENT: 5.0},
        }
    }
    problem = Problem(mission)
    z0 = jnp.asarray(ig.initial_guess(problem))
    return problem, z0


def _oracle_quantities(problem, z0):
    """lat/lon/alt/downrange/IIP at the waypoint knot via the scalar oracle."""
    v = problem.unpack(z0)
    un = problem.units
    i = problem.mission.events.index[WP_EVENT]
    xa = int(problem.ps.x_section_starts[i])
    pos_eci = np.asarray(v.pos[xa]) * un.position
    vel_eci = np.asarray(v.vel[xa]) * un.velocity
    t = float(v.t[i]) * un.t
    pos_ecef = ref.eci2ecef(pos_eci, t)
    vel_ecef = ref.vel_eci2ecef(vel_eci, pos_eci, t)
    lat, lon, alt = ref.ecef2geodetic(*pos_ecef)
    lc = problem.mission.launch
    dr = ref.vincenty(lc["lat"], lc["lon"], lat, lon)
    iip = ref.iip_faa(pos_ecef, vel_ecef)
    return dict(lat=lat, lon=lon, altitude=alt, downrange=dr,
                lat_IIP=iip[0], lon_IIP=iip[1])


def test_waypoint_residual_values(setup):
    problem, z0 = setup
    q = _oracle_quantities(problem, z0)

    # expected residuals in assembly order (problem._build_waypoint_rows):
    # equalities: lat, lon, altitude, downrange then IIP lat, lon
    def norm(key, raw, val):
        if key in ("altitude", "downrange"):
            return raw / val - 1.0
        scale = 1.0 / 90.0 if key in ("lat", "lat_IIP") else 1.0 / 180.0
        return (raw - val) * scale

    ge = problem.eq_constraint_groups(z0)
    got_eq = np.concatenate([np.asarray(ge["posLLH"]), np.asarray(ge["iip"])])
    want_eq = [norm(k, q[k], TARGETS[k])
               for k in ("lat", "lon", "altitude", "downrange",
                         "lat_IIP", "lon_IIP")]
    np.testing.assert_allclose(got_eq, want_eq, rtol=1e-6, atol=1e-9)

    # inequalities: per-quantity min then max rows, same order
    gi = problem.ineq_constraint_groups(z0)
    got_in = np.concatenate([np.asarray(gi["posLLH"]), np.asarray(gi["iip"])])
    want_in = []
    for k in ("lat", "lon", "altitude", "downrange", "lat_IIP", "lon_IIP"):
        want_in.append(norm(k, q[k], TARGETS[k] * 0.9))   # min: r >= 0
        want_in.append(-norm(k, q[k], TARGETS[k] * 1.1))  # max: -r >= 0
    np.testing.assert_allclose(got_in, want_in, rtol=1e-6, atol=1e-9)


def test_antenna_residual_value(setup):
    problem, z0 = setup
    v = problem.unpack(z0)
    un = problem.units
    i = problem.mission.events.index[ANT_EVENT]
    xa = int(problem.ps.x_section_starts[i])
    pos_eci = np.asarray(v.pos[xa]) * un.position
    t = float(v.t[i]) * un.t
    pos_ecef = ref.eci2ecef(pos_eci, t)
    ant = ref.geodetic2ecef(26.0, -81.0, 20.0)
    d = pos_ecef - ant
    d = d / np.linalg.norm(d)
    la, lo = np.radians(26.0), np.radians(-81.0)
    up = np.array([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                   np.sin(la)])
    want = d @ up - np.sin(np.radians(5.0))

    gi = problem.ineq_constraint_groups(z0)
    np.testing.assert_allclose(np.asarray(gi["antenna"]), [want],
                               rtol=1e-6, atol=1e-9)


def test_iip_kernel_against_oracle_on_mission_states(setup):
    """The vectorized IIP at several mission knots equals the scalar FAA
    fixed-point oracle (beyond the synthetic states in test_ops)."""
    from gelato_tpu.ops.earth import eci2ecef as j_eci2ecef
    from gelato_tpu.ops.earth import vel_eci2ecef as j_vel_eci2ecef
    from gelato_tpu.ops.iip import posLLH_IIP_FAA

    problem, z0 = setup
    v = problem.unpack(z0)
    un = problem.units
    checked = 0
    for i in range(4, problem.S):
        xa = int(problem.ps.x_section_starts[i])
        pos_eci = np.asarray(v.pos[xa]) * un.position
        vel_eci = np.asarray(v.vel[xa]) * un.velocity
        t = float(v.t[i]) * un.t
        pos_ecef = ref.eci2ecef(pos_eci, t)
        vel_ecef = ref.vel_eci2ecef(vel_eci, pos_eci, t)
        want = ref.iip_faa(pos_ecef, vel_ecef)
        pe = j_eci2ecef(jnp.asarray([pos_eci, pos_eci]), jnp.asarray([t, t]))
        ve = j_vel_eci2ecef(jnp.asarray([vel_eci, vel_eci]),
                            jnp.asarray([pos_eci, pos_eci]),
                            jnp.asarray([t, t]))
        got = np.asarray(posLLH_IIP_FAA(pe, ve))[0]
        if want is None:
            continue
        np.testing.assert_allclose(got[:2], want, rtol=1e-8, atol=1e-8,
                                   err_msg=f"section {i}")
        checked += 1
    assert checked >= 3
