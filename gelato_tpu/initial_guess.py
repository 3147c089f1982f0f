"""Initial-guess generation: forward RK4 flight simulation or CSV interpolation.

TPU-native rebuild of /root/reference/initialize.py: the event-stepped RK4
loop (initialize.py:114-179) becomes a ``lax.scan`` over a fixed time grid
with per-step parameters precomputed host-side (event schedule is static for
the initial guess), and the CSV path (initialize.py:322-413) is plain column
interpolation onto the LGR grids.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .dynamics import state_rate, zerolift_turn_correct
from .ops.quaternion import normalize
from .problem import Problem


def _u_table(problem: Problem):
    """Per-collocation-node [time, roll, pitch, yaw] rate table
    (initialize.py:291-306)."""
    ev = problem.mission.events
    ps = problem.ps
    t_knots = ev.time
    times, rates = [], []
    for i in range(problem.S):
        to, tf = t_knots[i], t_knots[i] + ev.timeduration[i]
        tau = ps.tau[i][ps.node_mask[i]]
        times.append(tau * (tf - to) / 2.0 + (tf + to) / 2.0)
        n = ps.num_nodes[i]
        rates.append(
            np.tile([0.0, ev.pitchrate_init[i], ev.yawrate_init[i]], (n, 1))
        )
    return np.concatenate(times), np.vstack(rates)


def simulate(problem: Problem, dt=0.1):
    """Forward-integrate the full mission; returns (t_grid, states [K, 11]).

    Parity: rocket_simulation (initialize.py:114-179) with identical event
    stepping, mass jettison, zero-lift-turn quaternion correction, and
    renormalization each step.
    """
    mission = problem.mission
    ev = mission.events
    t0, t_final = float(ev.time[0]), float(ev.time[-1])
    n_steps = int(np.ceil((t_final - t0) / dt - 1e-9))

    # host-side schedule: event index per step via the reference's rule
    # (advance when t + dt exceeds the next event time)
    t_steps = t0 + dt * np.arange(n_steps)
    event_idx = np.zeros(n_steps, dtype=int)
    e = -1
    jettison = np.zeros(n_steps)
    for k in range(n_steps):
        tn = t_steps[k] + dt
        if e < len(ev.time) - 1 and tn > ev.time[e + 1]:
            e += 1
            jettison[k] = ev.mass_jettison[e]
        event_idx[k] = e

    u_times, u_rates = _u_table(problem)
    u_steps = np.stack(
        [np.interp(t_steps, u_times, u_rates[:, j]) for j in range(3)], axis=1
    )

    per_step = dict(
        t=jnp.asarray(t_steps),
        u=jnp.asarray(u_steps),
        jettison=jnp.asarray(jettison),
        thrust=jnp.asarray(ev.thrust[event_idx]),
        massflow=jnp.asarray(ev.massflow[event_idx]),
        area=jnp.asarray(ev.reference_area[event_idx]),
        nozzle=jnp.asarray(ev.nozzle_area[event_idx]),
        zlt=jnp.asarray(ev.zero_lift_turn[event_idx]),
    )

    wind = jnp.asarray(mission.wind_table)
    ca = jnp.asarray(mission.ca_table)
    x0 = jnp.concatenate([
        jnp.asarray([problem.x_init["mass"]]),
        jnp.asarray(problem.x_init["position"]),
        jnp.asarray(problem.x_init["velocity"]),
        jnp.asarray(problem.x_init["quaternion"]),
    ])

    # flame-out floor: a nominal schedule may demand more propellant than a
    # stage carries (the reference integrator then drives the mass negative,
    # initialize.py:147-163, producing unusable guesses); gate the engine off
    # near the floor so the guess stays physical
    mass_floor = 1.0e-3 * float(problem.x_init["mass"])

    def rk4(x, u3, t, p):
        def f(xx, tt):
            alive = xx[0] > mass_floor
            return state_rate(xx, u3, tt,
                              jnp.where(alive, p["thrust"], 0.0),
                              jnp.where(alive, p["massflow"], 0.0),
                              p["area"], p["nozzle"], False, wind, ca)
        k1 = f(x, t)
        k2 = f(x + dt / 2.0 * k1, t + dt / 2.0)
        k3 = f(x + dt / 2.0 * k2, t + dt / 2.0)
        k4 = f(x + dt * k3, t + dt)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0 * dt

    def step(x, inp):
        # clamp: jettison of an already-exhausted vehicle cannot go negative
        x = x.at[0].set(jnp.maximum(x[0] - inp["jettison"], 1.0))
        xn = rk4(x, inp["u"], inp["t"], inp)
        tn = inp["t"] + dt
        q_zlt = zerolift_turn_correct(xn, tn, wind)
        q = jnp.where(inp["zlt"], q_zlt, xn[7:11])
        xn = xn.at[7:11].set(normalize(q))
        return xn, xn

    _, xs = jax.lax.scan(step, x0, per_step)
    t_grid = np.concatenate([[t0], np.asarray(t_steps) + dt])
    states = np.vstack([np.asarray(x0)[None], np.asarray(xs)])
    return t_grid, states


def _node_times(problem: Problem):
    """Dimensional state-node and control-node time grids (nominal knots)."""
    ev = problem.mission.events
    ps = problem.ps
    t_x = np.asarray(ps.time_nodes_x(ev.time))
    tx_flat, tu_flat = [], []
    for i in range(problem.S):
        n = ps.num_nodes[i]
        tx_flat.append(t_x[i, : n + 1])
        tu_flat.append(t_x[i, 1 : n + 1])
    return np.concatenate(tx_flat), np.concatenate(tu_flat)


def from_simulation(problem: Problem, dt=0.1):
    """z0 from the forward simulation (initialize_xdict_6DoF_2,
    initialize.py:238-319)."""
    t_grid, states = simulate(problem, dt)
    tx, _ = _node_times(problem)
    x_nodes = np.stack(
        [np.interp(tx, t_grid, states[:, j]) for j in range(11)], axis=1
    )
    return _pack_guess(problem, x_nodes)


def _knot_times_from_file(problem: Problem, df):
    """Recover converged knot times from the trajectory file's event markers.

    The reference interpolates a previous solution onto grids built from the
    *nominal* event times (initialize.py:346-362) even though the file
    carries the converged times in its ``event`` column — which leaves the
    free-knot sections far from feasibility and can drop the optimizer into a
    worse basin.  Here marked events pin the knots; missing events are filled
    from the time-chain offsets (exactly satisfying the equality_time rows)
    or nominal durations.
    """
    ev = problem.mission.events
    nominal = ev.time
    if "event" not in df.columns:
        return nominal.copy()
    marks = {}
    for nm in ev.names:
        row = df[df["event"] == nm]
        if len(row):
            marks[nm] = float(row["time"].iloc[0])
    if len(marks) < 2:
        return nominal.copy()
    t = np.full(len(ev.names), np.nan)
    for i, nm in enumerate(ev.names):
        if nm in marks:
            t[i] = marks[nm]
    # pass 1: time-chained knots are exact offsets from their reference
    changed = True
    while changed:
        changed = False
        for i in range(len(t)):
            ref = ev.time_ref[i]
            if np.isnan(t[i]) and ref is not None and not np.isnan(t[ev.index[ref]]):
                t[i] = t[ev.index[ref]] + (nominal[i] - nominal[ev.index[ref]])
                changed = True
    # pass 2: free knots interpolate proportionally between known neighbours
    known = np.where(~np.isnan(t))[0]
    for i in np.where(np.isnan(t))[0]:
        before = known[known < i]
        after = known[known > i]
        if before.size and after.size:
            a, b = before[-1], after[0]
            frac = (nominal[i] - nominal[a]) / max(nominal[b] - nominal[a], 1e-9)
            t[i] = t[a] + frac * (t[b] - t[a])
        elif before.size:
            a = before[-1]
            t[i] = t[a] + (nominal[i] - nominal[a])
        else:
            t[i] = nominal[i]
    # safety: strict ordering (should already hold)
    for i in range(1, len(t)):
        if t[i] <= t[i - 1]:
            t[i] = t[i - 1] + 0.1
    return t


def from_file(problem: Problem, df):
    """z0 by interpolating a previous trajectory CSV
    (initialize_xdict_6DoF_from_file, initialize.py:322-413), with knot times
    recovered from the file's event markers when present."""
    t_knots = _knot_times_from_file(problem, df)
    ps = problem.ps
    t_x = np.asarray(ps.time_nodes_x(t_knots))
    tx_l, tu_l = [], []
    for i in range(problem.S):
        n = ps.num_nodes[i]
        tx_l.append(t_x[i, : n + 1])
        tu_l.append(t_x[i, 1 : n + 1])
    tx, tu = np.concatenate(tx_l), np.concatenate(tu_l)
    tt = df["time"].to_numpy(float)

    def col(name, grid):
        return np.interp(grid, tt, df[name].to_numpy(float))

    x_nodes = np.stack(
        [col("mass", tx)]
        + [col(f"pos_ECI_{c}", tx) for c in "XYZ"]
        + [col(f"vel_ECI_{c}", tx) for c in "XYZ"]
        + [col(f"quat_ECI2BODY_{j}", tx) for j in range(4)],
        axis=1,
    )
    u_nodes = np.stack([col("rate_BODY_Y", tu), col("rate_BODY_Z", tu)], axis=1)
    return _pack_guess(problem, x_nodes, u_nodes, t_knots)


def _pack_guess(problem: Problem, x_nodes, u_nodes=None, t_knots=None):
    un = problem.units
    ev = problem.mission.events
    if u_nodes is None:
        _, u_rates = _u_table(problem)
        u_nodes = u_rates[:, 1:3]
    t = (ev.time if t_knots is None else np.asarray(t_knots)) / un.t
    return np.asarray(problem.pack(
        jnp.asarray(x_nodes[:, 0] / un.mass),
        jnp.asarray(x_nodes[:, 1:4] / un.position),
        jnp.asarray(x_nodes[:, 4:7] / un.velocity),
        jnp.asarray(x_nodes[:, 7:11]),
        jnp.asarray(u_nodes / un.u),
        jnp.asarray(t),
    ))


def initial_guess(problem: Problem, dt=0.1):
    """File-based guess when the mission provides one, else forward sim
    (Trajectory_Optimization.py:179-191)."""
    if problem.mission.initial_trajectory is not None:
        return from_file(problem, problem.mission.initial_trajectory)
    return from_simulation(problem, dt)
