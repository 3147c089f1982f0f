"""Result post-processing: the 50+-column trajectory DataFrame.

Column-for-column parity with the reference's writer
(/root/reference/output_result.py:37-263), but evaluated as batched JAX ops
over all nodes at once instead of a Python loop per node.
"""

import numpy as np
import pandas as pd
import jax.numpy as jnp

from .ops import aero, orbital
from .ops.earth import (
    eci2ecef,
    vel_eci2ecef,
    eci2geodetic,
    distance_vincenty,
    quat_ecef2nedg,
    quat_eci2nedg,
)
from .ops.atmosphere import (
    geopotential_altitude,
    airdensity_at,
    airpressure_at,
    speed_of_sound,
)
from .ops.iip import posLLH_IIP_FAA
from .ops.quaternion import quatrot, quatconj, normalize, quatmult, euler_from_quat
from .problem import Problem


def node_times(problem: Problem, t_knots_dimless):
    """Dimensional state-node (tx) and control-node (tu) times from the
    optimized knots (Trajectory_Optimization.py:476-491)."""
    un = problem.units
    t = np.asarray(t_knots_dimless) * un.t
    ps = problem.ps
    tx, tu = [], []
    for i in range(problem.S):
        to, tf = t[i], t[i + 1]
        tau = ps.tau[i][ps.node_mask[i]]
        t_col = tau * (tf - to) / 2.0 + (tf + to) / 2.0
        tx.append(np.concatenate([[to], t_col]))
        tu.append(t_col)
    return np.concatenate(tx), np.concatenate(tu)


def output_result(problem: Problem, z):
    """Build the full per-node result DataFrame from a solution vector."""
    un = problem.units
    v = problem.unpack(jnp.asarray(z))
    mission = problem.mission
    ev = mission.events

    tx, tu = node_times(problem, v.t)
    N = tx.size

    mass = np.asarray(v.mass) * un.mass
    pos = np.asarray(v.pos) * un.position
    vel = np.asarray(v.vel) * un.velocity
    quat = np.asarray(normalize(v.quat))
    u = np.asarray(v.u) * un.u

    # section id of each x-node (section start included)
    section = np.concatenate([
        np.full(problem.ps.num_nodes[i] + 1, i) for i in range(problem.S)
    ])

    # --- batched geometry ---
    pos_j = jnp.asarray(pos)
    vel_j = jnp.asarray(vel)
    quat_j = jnp.asarray(quat)
    t_j = jnp.asarray(tx)
    wind = jnp.asarray(mission.wind_table)

    llh = np.asarray(eci2geodetic(pos_j, t_j))
    alt_geop = np.asarray(geopotential_altitude(jnp.asarray(llh[:, 2])))
    downrange = np.asarray(distance_vincenty(
        mission.launch["lat"], mission.launch["lon"], llh[:, 0], llh[:, 1]
    ))
    elem = np.asarray(orbital.orbital_elements(pos_j, vel_j))

    pos_ecef = np.asarray(eci2ecef(pos_j, t_j))
    vel_ecef = np.asarray(vel_eci2ecef(vel_j, pos_j, t_j))
    vel_ground_ned = np.asarray(
        quatrot(quat_ecef2nedg(jnp.asarray(pos_ecef)), jnp.asarray(vel_ecef))
    )
    vel_ned = np.asarray(quatrot(quat_eci2nedg(pos_j, t_j), vel_j))
    wind_ned_v = np.asarray(aero.wind_ned(jnp.asarray(alt_geop), wind))
    vel_air_ned = vel_ground_ned - wind_ned_v

    rho = np.asarray(airdensity_at(jnp.asarray(alt_geop)))
    p_amb = np.asarray(airpressure_at(jnp.asarray(alt_geop)))
    sos = np.asarray(speed_of_sound(jnp.asarray(alt_geop)))

    q_dyn = 0.5 * np.sum(vel_air_ned**2, axis=1) * rho
    aoa_all = np.asarray(
        aero.angle_of_attack_all_rad(pos_j, vel_j, quat_j, t_j, wind)
    ) * 180.0 / np.pi
    aoa_ab = np.asarray(
        aero.angle_of_attack_ab_rad(pos_j, vel_j, quat_j, t_j, wind)
    ) * 180.0 / np.pi

    thrustdir = np.asarray(aero.quatrot_inv_x(quat_j))
    euler = np.asarray(euler_from_quat(
        quatmult(quatconj(quat_eci2nedg(pos_j, t_j)), quat_j)
    ))

    va_eci, _ = aero.vel_air_eci(pos_j, vel_j, t_j, wind)
    va_eci = np.asarray(va_eci)
    va_norm = np.linalg.norm(va_eci, axis=1)
    mach = va_norm / sos
    ca = np.interp(mach, mission.ca_table[:, 0], mission.ca_table[:, 1])

    sec_thrust = ev.thrust[section]
    sec_nozzle = ev.nozzle_area[section]
    sec_area = ev.reference_area[section]
    thrust_n = sec_thrust - sec_nozzle * p_amb
    aero_eci = (0.5 * rho * va_norm * sec_area * ca)[:, None] * (-va_eci)
    aero_body = np.asarray(quatrot(quat_j, jnp.asarray(aero_eci)))

    iip = np.asarray(posLLH_IIP_FAA(jnp.asarray(pos_ecef), jnp.asarray(vel_ecef),
                                    fill_na=False))

    events_col = [""] * N
    stage_col = [""] * N
    # event name marks the first node of each section; stage from section
    starts = np.cumsum([0] + [problem.ps.num_nodes[k] + 1 for k in range(problem.S)])
    for i in range(problem.S):
        events_col[starts[i]] = ev.names[i]
        for k in range(starts[i], starts[i + 1]):
            stage_col[k] = str(ev.rocket_stage[i])

    out = {
        "event": events_col,
        "time": np.round(tx, 6),
        "stage": stage_col,
        "section": section.astype("i4"),
        "thrust": thrust_n,
        "mass": mass,
        "lat": llh[:, 0],
        "lon": llh[:, 1],
        "lat_IIP": iip[:, 0],
        "lon_IIP": iip[:, 1],
        "downrange": downrange,
        "altitude": llh[:, 2],
        "altitude_apogee": elem[:, 0] * (1.0 + elem[:, 1]) - 6378137.0,
        "altitude_perigee": elem[:, 0] * (1.0 - elem[:, 1]) - 6378137.0,
        "inclination": elem[:, 2],
        "argument_perigee": elem[:, 4],
        "lon_ascending_node": elem[:, 3],
        "true_anomaly": elem[:, 5],
        "pos_ECI_X": pos[:, 0],
        "pos_ECI_Y": pos[:, 1],
        "pos_ECI_Z": pos[:, 2],
        "vel_ECI_X": vel[:, 0],
        "vel_ECI_Y": vel[:, 1],
        "vel_ECI_Z": vel[:, 2],
        "vel_ground_NED_X": vel_ground_ned[:, 0],
        "vel_ground_NED_Y": vel_ground_ned[:, 1],
        "vel_ground_NED_Z": vel_ground_ned[:, 2],
        "quat_ECI2BODY_0": quat[:, 0],
        "quat_ECI2BODY_1": quat[:, 1],
        "quat_ECI2BODY_2": quat[:, 2],
        "quat_ECI2BODY_3": quat[:, 3],
        "accel_BODY_X": (thrust_n + aero_body[:, 0]) / mass,
        "aero_BODY_X": aero_body[:, 0],
        "heading_NED2BODY": euler[:, 0],
        "pitch_NED2BODY": euler[:, 1],
        "roll_NED2BODY": euler[:, 2],
        "vel_inertial": np.linalg.norm(vel, axis=1),
        "flightpath_vel_inertial_geocentric": np.degrees(
            np.arcsin(np.clip(-vel_ned[:, 2] / np.maximum(
                np.linalg.norm(vel_ned, axis=1), 1e-30), -1, 1))
        ),
        "azimuth_vel_inertial_geocentric": np.degrees(
            np.arctan2(vel_ned[:, 1], vel_ned[:, 0])
        ),
        "thrust_direction_ECI_X": thrustdir[:, 0],
        "thrust_direction_ECI_Y": thrustdir[:, 1],
        "thrust_direction_ECI_Z": thrustdir[:, 2],
        "rate_BODY_X": np.zeros(N),
        "rate_BODY_Y": np.interp(tx, tu, u[:, 0]),
        "rate_BODY_Z": np.interp(tx, tu, u[:, 1]),
        "vel_ground": np.linalg.norm(vel_ecef, axis=1),
        "vel_air": va_norm,
        "AOA_total": aoa_all,
        "AOA_pitch": aoa_ab[:, 0],
        "AOA_yaw": aoa_ab[:, 1],
        "dynamic_pressure": q_dyn,
        "Q_alpha": aoa_all * q_dyn,
        "M": mach,
    }
    return pd.DataFrame(out)


def result_summary(problem: Problem, z, info, mission_file=""):
    """Text summary lines (optResult.txt parity,
    Trajectory_Optimization.py:497-524)."""
    from . import __version__

    mission = problem.mission
    v = problem.unpack(jnp.asarray(z))
    m_res = np.asarray(v.mass) * problem.units.mass
    mass_drop = sum(
        sum(i["mass"] for i in (s.get("dropMass") or {}).values())
        for s in mission.stages.values()
    )
    lines = [
        f"GELATO-TPU: TPU-NATIVE LAUNCH TRAJECTORY OPTIMIZER v{__version__}\n\n",
        f"Input file name : {mission_file}\n\n",
        f"initial mass    : {m_res[0]:10.3f} kg\n",
        f"final mass      : {m_res[-1]:10.3f} kg\n",
        f"payload         : {m_res[0] - mission.m_init - mass_drop:10.3f} kg\n\n",
        f"optTime         : {info.get('optTime', 0.0):11.6f}\n",
        f"iterations      : {info.get('iterations', 0):4d}\n",
        f"KKT error       : {info.get('err', float('nan')):11.3e}\n\n",
        {"optimal": "CONVERGED (optimal)\n",
         "acceptable": "CONVERGED (acceptable level)\n"}.get(
            info.get("status"),
            "CONVERGED\n" if info.get("converged") else "NOT CONVERGED\n"),
    ]
    return lines
