"""NLP assembly: mission config → variable layout, objective, constraints.

The reference builds a pyoptsparse problem from 22 constraint groups with
hand-written COO Jacobians (/root/reference/Trajectory_Optimization.py:194-416).
Here the whole constraint system is two pure jittable functions
``eq_constraints(z)`` / ``ineq_constraints(z)`` over one flat fp64 vector;
Jacobians come from ``jax.jacfwd`` and every per-section loop is a batched
operation over the padded ``SectionStack``.

Variable layout (flat vector ``z``, identical content to the reference's
xdict blocks so solutions map one-to-one):
  [ mass (M) | position (3M) | velocity (3M) | quaternion (4M) |
    u (2N) | t (S+1) ]
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import _host_math as hm
from .config import Mission, ATT_HOLD, ATT_KICK, ATT_PITCH_YAW, ATT_SAME_RATE
from .dynamics import acceleration_eci, quaternion_rate
from .ops import aero
from .ops.earth import eci2ecef, vel_eci2ecef, eci2geodetic, distance_vincenty, quat_nedg2ecef
from .ops.iip import posLLH_IIP_FAA
from .ops.quaternion import quatrot, normalize
from .transcription import SectionStack

GM = 3.986004418e14

_SOURCE_HASH = None


def _source_hash():
    """sha256 over the *pattern-relevant* .py sources — the cache salt.

    The Jacobian sparsity pattern is a pure function of (mission content,
    constraint code); salting the cache key with the source bytes makes any
    constraint-code change invalidate every cached pattern, so a stale
    pattern can never silently produce wrong colored Jacobians or struct
    groupings.  Only the modules the constraint evaluation actually imports
    are hashed — problem/config/dynamics/compat plus transcription/ and
    ops/.  Solver or batch edits cannot change sparsity, and hashing them
    too (round ≤3 behavior) threw away the cache on every solver tweak:
    each probe re-run costs ~4 min of the driver's bench budget on this
    1-vCPU host.
    """
    global _SOURCE_HASH
    if _SOURCE_HASH is None:
        import hashlib
        import os

        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.abspath(__file__))
        paths = [os.path.join(pkg, f) for f in
                 ("problem.py", "config.py", "dynamics.py", "compat.py")]
        for sub in ("transcription", "ops"):
            d = os.path.join(pkg, sub)
            if os.path.isdir(d):
                paths.extend(os.path.join(d, fn)
                             for fn in sorted(os.listdir(d))
                             if fn.endswith(".py"))
        for p in paths:
            if os.path.exists(p):
                with open(p, "rb") as f:
                    h.update(f.read())
        _SOURCE_HASH = h.hexdigest()
    return _SOURCE_HASH


def _pattern_cache_path(problem, z0):
    """Cache file for this (mission, mesh, code) triple, or None.

    Lives **in-repo** (``gelato_tpu/_patterns/``) by default so entries can
    be committed and survive fresh containers — the driver's bench host is
    recreated every round, and a probe re-run there costs ~4 min of its
    budget.  Override with ``GELATO_PATTERN_CACHE_DIR``; falls back to
    ``~/.cache`` when the package directory is not writable.
    """
    import hashlib
    import json
    import os

    try:
        h = hashlib.sha256()
        h.update(_source_hash().encode())
        h.update(json.dumps(problem.mission.settings, sort_keys=True,
                            default=str).encode())
        ev = problem.mission.events
        for arr in (ev.num_nodes, ev.time, ev.rocket_stage, ev.engine_on,
                    ev.att_code):
            h.update(np.ascontiguousarray(arr).tobytes())
        h.update(str(list(ev.names)).encode())
        h.update(str(np.asarray(z0).shape).encode())
        d = os.environ.get("GELATO_PATTERN_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "_patterns")
        try:
            os.makedirs(d, exist_ok=True)
        except OSError:
            d = os.path.join(os.path.expanduser("~"), ".cache",
                             "gelato_tpu_patterns")
            os.makedirs(d, exist_ok=True)
        return os.path.join(d, h.hexdigest()[:32] + ".npz")
    except Exception:  # noqa: BLE001 - cache is best-effort only
        return None


def _load_pattern_cache(problem, z0):
    import os

    path = _pattern_cache_path(problem, z0)
    if path is None or not os.path.exists(path):
        return None
    try:
        d = np.load(path)
        return d["pat_eq"].astype(bool), d["pat_in"].astype(bool)
    except Exception:  # noqa: BLE001 - unreadable cache = re-probe
        return None


def _store_pattern_cache(problem, z0, pat_eq, pat_in):
    path = _pattern_cache_path(problem, z0)
    if path is None:
        return
    try:
        np.savez_compressed(path, pat_eq=np.asarray(pat_eq, dtype=bool),
                            pat_in=np.asarray(pat_in, dtype=bool))
    except Exception:  # noqa: BLE001 - cache is best-effort only
        pass


@dataclass(frozen=True)
class Units:
    """Nondimensionalization (Trajectory_Optimization.py:153-165)."""

    mass: float
    position: float = 6378137.0
    velocity: float = 1000.0
    u: float = 1.0
    t: float = 1.0


class Vars:
    """Unpacked view of the flat variable vector (dimensionless)."""

    __slots__ = ("mass", "pos", "vel", "quat", "u", "t",
                 "mass_s", "pos_s", "vel_s", "quat_s", "u_s")

    def __init__(self, mass, pos, vel, quat, u, t, ps):
        self.mass = mass
        self.pos = pos
        self.vel = vel
        self.quat = quat
        self.u = u
        self.t = t
        xi = ps.x_index
        ui = ps.u_index
        self.mass_s = mass[xi]
        self.pos_s = pos[xi]
        self.vel_s = vel[xi]
        self.quat_s = quat[xi]
        self.u_s = u[ui]


class Problem:
    """Static NLP structure for one mission configuration."""

    def __init__(self, mission: Mission, user_equality=None, user_inequality=None):
        self.mission = mission
        ev = mission.events
        S = mission.num_sections
        self.ps = SectionStack.build(ev.num_nodes[:-1])
        ps = self.ps
        self.S, self.N, self.M = ps.S, ps.N, ps.M

        # --- units & initial state (host scalar math) ---
        self.units = Units(mass=mission.m_init, t=float(ev.time[-1]))
        lc = mission.launch
        site_ecef = hm.geodetic2ecef(lc["lat"], lc["lon"], lc["altitude"])
        r_init = hm.ecef2eci(site_ecef, 0.0)
        v_init = hm.vel_ecef2eci(np.zeros(3), site_ecef, 0.0)
        q_init = hm.quatmult(
            hm.quat_eci2nedg(r_init, 0.0),
            hm.quat_from_euler(lc["flight_azimuth_init"], 90.0, 0.0),
        )
        self.x_init = dict(mass=mission.m_init, position=r_init,
                           velocity=v_init, quaternion=q_init)

        # --- variable layout ---
        M, N = self.M, self.N
        self.off_mass = 0
        self.off_pos = M
        self.off_vel = 4 * M
        self.off_quat = 7 * M
        self.off_u = 11 * M
        self.off_t = 11 * M + 2 * N
        self.n_z = 11 * M + 2 * N + S + 1

        # --- static per-section parameter stacks (sections 0..S-1) ---
        self.sec_thrust = jnp.asarray(ev.thrust[:-1])
        self.sec_massflow = jnp.asarray(ev.massflow[:-1])
        self.sec_air_area = jnp.asarray(ev.reference_area[:-1])
        self.sec_nozzle = jnp.asarray(ev.nozzle_area[:-1])
        self.sec_engine_on = jnp.asarray(ev.engine_on[:-1])
        self.att_hold = jnp.asarray(ev.att_code[:-1] == ATT_HOLD)

        self.D = jnp.asarray(ps.D)
        self.node_mask = jnp.asarray(ps.node_mask)
        self.x_index = jnp.asarray(ps.x_index)
        self.u_index = jnp.asarray(ps.u_index)
        vr_sec, vr_node = ps.scatter_valid_rows()
        self.vr_sec = jnp.asarray(vr_sec)
        self.vr_node = jnp.asarray(vr_node)

        self.wind = jnp.asarray(mission.wind_table)
        self.ca = jnp.asarray(mission.ca_table)

        self._build_time_rows()
        self._build_knot_rows()
        self._build_rate_rows()
        self._build_terminal()
        self._build_aero_rows()
        self._build_waypoint_rows()
        self._build_misc_ineq()
        self.user_equality = user_equality
        self.user_inequality = user_inequality

        # group metadata (name, row count) discovered by probing
        self._group_sizes = None

    # ------------------------------------------------------------------
    # packing helpers

    def unpack(self, z):
        M, N = self.M, self.N
        mass = z[self.off_mass:self.off_pos]
        pos = z[self.off_pos:self.off_vel].reshape(M, 3)
        vel = z[self.off_vel:self.off_quat].reshape(M, 3)
        quat = z[self.off_quat:self.off_u].reshape(M, 4)
        u = z[self.off_u:self.off_t].reshape(N, 2)
        t = z[self.off_t:]
        return Vars(mass, pos, vel, quat, u, t, self.ps)

    def pack(self, mass, pos, vel, quat, u, t):
        return jnp.concatenate([
            jnp.ravel(mass), jnp.ravel(pos), jnp.ravel(vel),
            jnp.ravel(quat), jnp.ravel(u), jnp.ravel(t),
        ])

    def bounds(self):
        """Variable box bounds (Trajectory_Optimization.py:318-352).

        One deliberate deviation: the launch knot time t0 is pinned to
        time[0] by an *equality* (con_init_terminal_knot.py:135), and the
        reference's t >= 0 box puts that pin exactly on the bound — a
        degenerate setup that forces the interior-point bound dual to
        mu/bound_relax (~1e5+) before stationarity can close.  Since the
        equality dominates, the box on t0 is redundant; it is widened here so
        the barrier stays benign.  The feasible set is unchanged.
        """
        M, N, S = self.M, self.N, self.S
        lb = np.concatenate([
            np.full(M, 1.0e-9), np.full(3 * M, -10.0), np.full(3 * M, -20.0),
            np.full(4 * M, -1.0), np.full(2 * N, -9.0), np.full(S + 1, 0.0),
        ])
        ub = np.concatenate([
            np.full(M, 2.0), np.full(3 * M, 10.0), np.full(3 * M, 20.0),
            np.full(4 * M, 1.0), np.full(2 * N, 9.0), np.full(S + 1, 1.5),
        ])
        t0_nominal = self.mission.events.time[0] / self.units.t
        lb[self.off_t] = t0_nominal - 0.05
        ub[self.off_t] = t0_nominal + 0.05
        return lb, ub

    # ------------------------------------------------------------------
    # static structure builders (host side, run once)

    def _build_time_rows(self):
        """equality_time / inequality_time structure
        (lib/con_init_terminal_knot.py:124-145,408-421)."""
        ev = self.mission.events
        idx = ev.index
        self.time_eq_rows = [
            (i, idx[ev.time_ref[i]], ev.time[i] - ev.time[idx[ev.time_ref[i]]])
            for i in range(1, self.S + 1)
            if ev.time_ref[i] is not None
        ]
        fixed = [ev.time_ref[i] is not None for i in range(self.S + 1)]
        self.time_ineq_rows = [
            i for i in range(self.S) if not (fixed[i] and fixed[i + 1])
        ]

    def _build_knot_rows(self):
        """equality_knot_LGR structure (lib/con_init_terminal_knot.py:174-245)."""
        mission = self.mission
        ev = mission.events
        names = ev.names
        ps = self.ps
        sep_sections = []
        stage_rows = []  # (idx_ig, idx_sep, mass_stage)
        for key, stage in mission.stages.items():
            if stage.get("separation_at") is None:
                continue
            sec_ig = names.index(stage["ignition_at"])
            sec_sep = names.index(stage["separation_at"])
            sep_sections.append(sec_sep)
            mass_stage = (
                stage["mass_dry"] + stage["mass_propellant"]
                + sum(i["mass"] for i in (stage.get("dropMass") or {}).values())
            )
            stage_rows.append((
                ps.get_index(sec_ig)[2], ps.get_index(sec_sep)[2], mass_stage
            ))
        self.knot_stage_rows = stage_rows
        self.knot_sep_sections = set(sep_sections)
        self.knot_mass_rows = [
            (ps.get_index(i)[2], ev.mass_jettison[i])
            for i in range(1, self.S)
            if i not in self.knot_sep_sections
        ]
        self.knot_cont_sections = [ps.get_index(i)[2] for i in range(1, self.S)]

    def _build_rate_rows(self):
        """equality_6DoF_rate as static (a, b, c) index triples over u.ravel():
        residual_k = u2[a_k] - c_k * u2[b_k] (lib/con_trajectory.py:160-207)."""
        ev = self.mission.events
        a, b, c = [], [], []
        for i in range(self.S):
            ua, ub, xa, xb, n = self.ps.get_index(i)
            code = ev.att_code[i]
            if code == ATT_HOLD:
                for j in range(ua, ub):
                    a += [2 * j, 2 * j + 1]
                    b += [0, 0]
                    c += [0.0, 0.0]
            elif code == ATT_KICK:
                for j in range(ua + 1, ub):
                    a.append(2 * j); b.append(2 * ua); c.append(1.0)
                for j in range(ua, ub):
                    a.append(2 * j + 1); b.append(0); c.append(0.0)
            elif code == ATT_PITCH_YAW:
                for j in range(ua + 1, ub):
                    a.append(2 * j); b.append(2 * ua); c.append(1.0)
                for j in range(ua + 1, ub):
                    a.append(2 * j + 1); b.append(2 * ua + 1); c.append(1.0)
            elif code == ATT_SAME_RATE:
                for j in range(ua, ub):
                    a.append(2 * j); b.append(2 * (ua - 1)); c.append(1.0)
                for j in range(ua, ub):
                    a.append(2 * j + 1); b.append(2 * (ua - 1) + 1); c.append(1.0)
            # ATT_FREE: no rows
        self.rate_a = jnp.asarray(np.asarray(a, dtype=np.int32))
        self.rate_b = jnp.asarray(np.asarray(b, dtype=np.int32))
        self.rate_c = jnp.asarray(np.asarray(c))
        # kick-turn inequality: -u_pitch at kick sections
        # (lib/con_trajectory.py:106-124; sections 0..S-2, "kick" in attitude)
        kick_idx = []
        for i in range(self.S - 1):
            if "kick" in ev.attitude[i]:
                ua, ub, _, _, n = self.ps.get_index(i)
                kick_idx += [2 * j for j in range(ua, ub)]
        self.kick_idx = jnp.asarray(np.asarray(kick_idx, dtype=np.int32))

        # propellant-budget inequality (lib/con_trajectory.py:34-61)
        mass_rows = []
        names = ev.names
        for key, stage in self.mission.stages.items():
            sec_ig = names.index(stage["ignition_at"])
            sec_co = names.index(stage["cutoff_at"])
            d_mass = stage["mass_propellant"] + sum(
                i["mass"] for i in (stage.get("dropMass") or {}).values()
            )
            mass_rows.append((
                self.ps.get_index(sec_ig)[2], self.ps.get_index(sec_co)[2], d_mass
            ))
        self.propellant_rows = mass_rows

    def _build_terminal(self):
        """Terminal energy/momentum/inclination targets
        (lib/con_init_terminal_knot.py:329-372).

        For *circular* targets the reference's (energy, momentum) pair is
        tangentially degenerate — p = a(1-e²) has dp/de = 0 at e = 0, so the
        two constraint gradients become linearly dependent at the solution
        and the multipliers blow up (LICQ failure; IPOPT survives it through
        dual regularization).  This rebuild switches to the equivalent
        full-rank formulation {|r| = R, r·v = 0, |v| = v_circ} when
        perigee == apogee; the feasible set is identical.
        """
        cond = self.mission.terminal
        self.terminal_circular = False
        if (cond.get("altitude_perigee") is not None
                and cond.get("altitude_apogee") is not None):
            hp, ha = cond["altitude_perigee"], cond["altitude_apogee"]
            ra, rp = 6378137.0 + ha, 6378137.0 + hp
            a = (ra + rp) / 2.0
            self.c_target = rp * np.sqrt(GM * (2.0 / rp - 1.0 / a))
            self.e_target = -GM / 2.0 / a
            if abs(ha - hp) < 1.0:
                self.terminal_circular = True
                self.r_target = rp
                self.v_target = np.sqrt(GM / rp)
        else:
            self.c_target = cond["radius"] * cond["vel_tangential_geocentric"]
            vf = cond["vel_tangential_geocentric"] / np.cos(
                np.radians(cond["flightpath_vel_inertial_geocentric"])
            )
            self.e_target = vf**2 / 2.0 - GM / cond["radius"]
            if abs(float(cond.get("flightpath_vel_inertial_geocentric", 0.0))) < 1e-12:
                e_ecc_sq = 1.0 + 2.0 * self.e_target * self.c_target**2 / GM**2
                if abs(e_ecc_sq) < 1e-9:  # circular via radius+velocity
                    self.terminal_circular = True
                    self.r_target = float(cond["radius"])
                    self.v_target = float(cond["vel_tangential_geocentric"])
        self.inclination_target = cond.get("inclination")

    def _build_aero_rows(self):
        """Aero path constraints: static (section, node, limit, kind) rows
        (lib/con_aero.py:89-248).  kind: 0=AOA, 1=q, 2=q-alpha."""
        fc = self.mission.flight_constraint
        ev = self.mission.events
        rows = {"sec": [], "node": [], "limit": [], "kind": []}
        specs = [
            ("AOA_max", 0, np.pi / 180.0),
            ("dynamic_pressure_max", 1, 1.0),
            ("Q_alpha_max", 2, np.pi / 180.0),
        ]
        for cfg_key, kind, scale in specs:
            cfg = fc.get(cfg_key, {}) or {}
            for i in range(self.S - 1):
                name = ev.names[i]
                if name not in cfg:
                    continue
                limit = cfg[name]["value"] * scale
                n = self.ps.num_nodes[i]
                if cfg[name]["range"] == "all":
                    nodes = range(n + 1)  # x-nodes incl. the initial point
                else:  # "initial"
                    nodes = [0]
                for k in nodes:
                    rows["sec"].append(i)
                    rows["node"].append(k)
                    rows["limit"].append(limit)
                    rows["kind"].append(kind)
        self.aero_sec = jnp.asarray(np.asarray(rows["sec"], dtype=np.int32))
        self.aero_node = jnp.asarray(np.asarray(rows["node"], dtype=np.int32))
        self.aero_limit = jnp.asarray(np.asarray(rows["limit"]))
        # kind masks stay host-side NumPy: they are *static* selectors
        self.aero_kind = np.asarray(rows["kind"], dtype=np.int32)
        self.n_aero_rows = len(rows["sec"])
        self.aero_counts = [int((self.aero_kind == k).sum()) for k in range(3)]

    def _build_waypoint_rows(self):
        """Waypoint / IIP / antenna structure (lib/con_waypoint.py).

        Note: the reference's inequality_posLLH divides the downrange *max*
        bound by the *min* value (con_waypoint.py:778) and misfiles two
        downrange-Jacobian rows (":704"); both are pre-existing bugs that this
        rebuild fixes (AD makes the second impossible to reproduce anyway).
        """
        fc = self.mission.flight_constraint
        ev = self.mission.events
        wp_cfg = fc.get("waypoint", {}) or {}
        ant_cfg = fc.get("antenna", {}) or {}

        eq_rows = []   # (section, quantity, target, scale) ; residual=(q-t)*scale or ratio
        ineq_rows = []
        # quantity codes: 0 lat, 1 lon, 2 alt, 3 downrange, 4 iip_lat, 5 iip_lon
        for i in range(self.S - 1):
            name = ev.names[i]
            if name not in wp_cfg:
                continue
            wp = wp_cfg[name]
            # ordering matches equality_posLLH / equality_IIP and the
            # inequality variants (lat, lon, altitude, downrange; min then max)
            def add(rows, qty, mode, key, sub):
                if key in wp and sub in wp[key]:
                    rows.append((i, qty, mode, float(wp[key][sub])))

            add(eq_rows, 0, "exact", "lat", "exact")
            add(eq_rows, 1, "exact", "lon", "exact")
            add(eq_rows, 2, "exact", "altitude", "exact")
            add(eq_rows, 3, "exact", "downrange", "exact")
            add(eq_rows, 4, "exact", "lat_IIP", "exact")
            add(eq_rows, 5, "exact", "lon_IIP", "exact")
            for qty, key in ((0, "lat"), (1, "lon"), (2, "altitude"), (3, "downrange"),
                             (4, "lat_IIP"), (5, "lon_IIP")):
                if key in wp and "min" in wp[key]:
                    ineq_rows.append((i, qty, "min", float(wp[key]["min"])))
                if key in wp and "max" in wp[key]:
                    ineq_rows.append((i, qty, "max", float(wp[key]["max"])))

        self.wp_eq_rows = eq_rows
        self.wp_ineq_rows = ineq_rows
        self.wp_sections = sorted({r[0] for r in eq_rows + ineq_rows})

        # antenna rows: (section, antenna ECEF pos, sin(elev_min))
        ant_rows = []
        for ant in ant_cfg.values():
            pos_ant = hm.geodetic2ecef(ant["lat"], ant["lon"], ant["altitude"])
            for i in range(self.S - 1):
                name = ev.names[i]
                if name in ant.get("elevation_min", {}):
                    emin = float(ant["elevation_min"][name])
                    ant_rows.append((i, pos_ant, np.sin(np.radians(emin))))
        self.antenna_rows = ant_rows

    def _build_misc_ineq(self):
        pass  # placeholder for future structure

    # ------------------------------------------------------------------
    # per-case problem data (dispersion batches)

    def case_nominal(self):
        """Nominal per-case data pytree.

        The reference's batch mode re-runs the whole program per settings
        file (run_batch.sh:75-79); here the dispersed *physics* — the wind
        table and an axial-force multiplier — ride through every constraint
        evaluation as data, so ``vmap`` over (state, case) solves physically
        distinct cases in lock-step (BASELINE target #2).
        """
        return {"wind": self.wind, "ca_scale": jnp.asarray(1.0)}

    def _case_tables(self, case):
        """(wind_table, ca_table) for a case (None → nominal)."""
        if case is None or (isinstance(case, tuple) and not case):
            return self.wind, self.ca
        wind = case.get("wind", self.wind)
        ca = self.ca
        scale = case.get("ca_scale")
        if scale is not None:
            ca = jnp.concatenate([ca[:, :1], ca[:, 1:] * scale], axis=1)
        return wind, ca

    # ------------------------------------------------------------------
    # shared evaluation pieces (dimensionless in/out)

    def _time_grids(self, t):
        """Section time grids: t_nodes_x [S, n_max+1] and (tf - to) [S]."""
        to = t[:-1]
        tf = t[1:]
        mid = (tf + to) * 0.5
        half = (tf - to) * 0.5
        tau = jnp.asarray(self.ps.tau)
        t_col = tau * half[:, None] + mid[:, None]
        t_x = jnp.concatenate([to[:, None], t_col], axis=1)
        return t_x, tf - to

    def _compact(self, res_sn):
        """[S, n_max, ...] masked residual → exact-N-row vector in ref order."""
        return res_sn[self.vr_sec, self.vr_node]

    def _node_accel(self, v: Vars, wind=None, ca=None):
        """Acceleration at all collocation nodes [S, n_max, 3] (dimensionless)."""
        un = self.units
        wind = self.wind if wind is None else wind
        ca = self.ca if ca is None else ca
        t_x, _ = self._time_grids(v.t)
        mass = v.mass_s[:, 1:] * un.mass
        pos = v.pos_s[:, 1:] * un.position
        vel = v.vel_s[:, 1:] * un.velocity
        quat = v.quat_s[:, 1:]
        t_phys = t_x[:, 1:] * un.t

        def per_section(m, p, vv, q, tt, thrust, area, nozzle):
            return acceleration_eci(m, p, vv, q, tt, thrust, area, nozzle,
                                    wind, ca)

        acc = jax.vmap(per_section)(
            mass, pos, vel, quat, t_phys,
            self.sec_thrust, self.sec_air_area, self.sec_nozzle,
        )
        return acc / un.velocity

    # ------------------------------------------------------------------
    # objective & constraint groups

    def objective(self, z, case=None):
        """cost_6DoF (lib/cost_gradient.py:29-34)."""
        v = self.unpack(z)
        if self.mission.optimization_mode == "Payload":
            return -v.mass[0]
        return v.t[-1]

    def eq_constraint_groups(self, z, case=None):
        """All equality groups, reference order (Trajectory_Optimization.py:197-219)."""
        v = self.unpack(z)
        un = self.units
        ev = self.mission.events
        wind, ca = self._case_tables(case)
        t_x, dt = self._time_grids(v.t)
        half_dt = dt * un.t / 2.0
        groups = {}

        # --- init (con_init_terminal_knot.py:41-57) ---
        init = []
        if self.mission.optimization_mode != "Payload":
            init.append(v.mass[:1] - self.x_init["mass"] / un.mass)
        init.append(v.pos[0] - jnp.asarray(self.x_init["position"]) / un.position)
        init.append(v.vel[0] - jnp.asarray(self.x_init["velocity"]) / un.velocity)
        init.append(v.quat[0] - jnp.asarray(self.x_init["quaternion"]))
        groups["init"] = jnp.concatenate(init)

        # --- time (con_init_terminal_knot.py:124-145) ---
        time_rows = [v.t[:1] - ev.time[0] / un.t]
        for i, iref, dt_const in self.time_eq_rows:
            time_rows.append(v.t[i:i+1] - v.t[iref:iref+1] - dt_const / un.t)
        groups["time"] = jnp.concatenate(time_rows)

        # --- dynamics: mass (con_dynamics.py:34-63) ---
        lh_m = jnp.einsum("sij,sj->si", self.D, v.mass_s)
        rh_m = (-self.sec_massflow / un.mass)[:, None] * half_dt[:, None]
        res_on = lh_m - rh_m
        res_off = v.mass_s[:, 1:] - v.mass_s[:, :1]
        groups["dyn_mass"] = self._compact(
            jnp.where(self.sec_engine_on[:, None], res_on, res_off)
        )

        # --- dynamics: position (con_dynamics.py:116-152) ---
        lh_p = jnp.einsum("sij,sjk->sik", self.D, v.pos_s)
        rh_p = v.vel_s[:, 1:] * (un.velocity / un.position) * half_dt[:, None, None]
        groups["dyn_pos"] = self._compact(lh_p - rh_p).ravel()

        # --- dynamics: velocity (con_dynamics.py:216-289) ---
        lh_v = jnp.einsum("sij,sjk->sik", self.D, v.vel_s)
        rh_v = self._node_accel(v, wind, ca) * half_dt[:, None, None]
        groups["dyn_vel"] = self._compact(lh_v - rh_v).ravel()

        # --- dynamics: quaternion (con_dynamics.py:499-533) ---
        lh_q = jnp.einsum("sij,sjk->sik", self.D, v.quat_s)
        rh_q = quaternion_rate(v.quat_s[:, 1:], v.u_s * un.u) * half_dt[:, None, None]
        res_q_dyn = lh_q - rh_q
        res_q_hold = v.quat_s[:, 1:] - v.quat_s[:, :1]
        groups["dyn_quat"] = self._compact(
            jnp.where(self.att_hold[:, None, None], res_q_hold, res_q_dyn)
        ).ravel()

        # --- knot (con_init_terminal_knot.py:174-245) ---
        knot = []
        for idx_ig, idx_sep, mass_stage in self.knot_stage_rows:
            knot.append(v.mass[idx_ig:idx_ig+1] - v.mass[idx_sep:idx_sep+1]
                        - mass_stage / un.mass)
        mass_row_iter = iter(self.knot_mass_rows)
        for sec, xa in enumerate(self.knot_cont_sections, start=1):
            if sec not in self.knot_sep_sections:
                xa_m, jettison = next(mass_row_iter)
                knot.append(v.mass[xa_m:xa_m+1] - v.mass[xa_m-1:xa_m]
                            + jettison / un.mass)
            knot.append(v.pos[xa] - v.pos[xa - 1])
            knot.append(v.vel[xa] - v.vel[xa - 1])
            knot.append(v.quat[xa] - v.quat[xa - 1])
        groups["knot"] = jnp.concatenate(knot)

        # --- terminal (con_init_terminal_knot.py:329-372) ---
        # Evaluated on 2-element batch to stay off the inaccurate TPU scalar
        # transcendental path.
        pv = jnp.stack([v.pos[-1] * un.position, v.vel[-1] * un.velocity])
        r_f, v_f = pv[0], pv[1]
        h_vec = jnp.cross(r_f, v_f)
        c = jnp.linalg.norm(h_vec)
        if self.terminal_circular:
            # full-rank circular-orbit rows (see _build_terminal)
            term = [
                jnp.linalg.norm(r_f) / self.r_target - 1.0,
                jnp.sum(r_f * v_f) / (self.r_target * self.v_target),
                jnp.linalg.norm(v_f) / self.v_target - 1.0,
            ]
        else:
            e = 0.5 * jnp.sum(v_f * v_f) - GM / jnp.linalg.norm(r_f)
            term = [e / self.e_target - 1.0, c / self.c_target - 1.0]
        if self.inclination_target is not None:
            inc = jnp.arccos(jnp.clip(h_vec[2] / c, -1.0, 1.0))
            term.append(inc - np.radians(self.inclination_target))
        groups["terminal"] = jnp.stack(term)

        # --- rate (con_trajectory.py:160-207) ---
        u2 = v.u.ravel()
        groups["rate"] = u2[self.rate_a] - self.rate_c * u2[self.rate_b]

        # --- waypoint posLLH / IIP equalities ---
        wq = self._waypoint_quantities(v)
        groups["posLLH"] = self._waypoint_residuals(self.wp_eq_rows, wq,
                                                    kinds=(0, 1, 2, 3))
        groups["iip"] = self._waypoint_residuals(self.wp_eq_rows, wq,
                                                 kinds=(4, 5))

        # --- user equality ---
        if self.user_equality is not None:
            res = self.user_equality(UserContext(self, v))
            if res is not None:
                groups["user"] = jnp.atleast_1d(jnp.asarray(res))

        return groups

    def ineq_constraint_groups(self, z, case=None):
        """All inequality groups (≥ 0), reference order
        (Trajectory_Optimization.py:221-238)."""
        v = self.unpack(z)
        un = self.units
        wind, _ = self._case_tables(case)
        groups = {}

        # --- aero limits (con_aero.py:89-248) ---
        if self.n_aero_rows:
            t_x, _ = self._time_grids(v.t)
            sec, node = self.aero_sec, self.aero_node
            pos = v.pos_s[sec, node] * un.position
            vel = v.vel_s[sec, node] * un.velocity
            quat = v.quat_s[sec, node]
            t_phys = t_x[sec, node] * un.t
            aoa = aero.angle_of_attack_all_rad(pos, vel, quat, t_phys, wind)
            q = aero.dynamic_pressure_pa(pos, vel, t_phys, wind)
            k = self.aero_kind  # static numpy mask
            vals = jnp.select(
                [jnp.asarray(k == 0), jnp.asarray(k == 1), jnp.asarray(k == 2)],
                [aoa, q, q * aoa],
            )
            rows = 1.0 - vals / self.aero_limit
            groups["alpha"] = rows[np.nonzero(k == 0)[0]]
            groups["q"] = rows[np.nonzero(k == 1)[0]]
            groups["qalpha"] = rows[np.nonzero(k == 2)[0]]
        else:
            groups["alpha"] = jnp.zeros(0)
            groups["q"] = jnp.zeros(0)
            groups["qalpha"] = jnp.zeros(0)

        # --- propellant budget (con_trajectory.py:34-61) ---
        rows = []
        for xa_ig, xa_co, d_mass in self.propellant_rows:
            rows.append(-v.mass[xa_ig:xa_ig+1] + v.mass[xa_co:xa_co+1]
                        + d_mass / un.mass)
        groups["mass"] = (jnp.concatenate(rows) if rows else jnp.zeros(0))

        # --- kick turn (con_trajectory.py:106-124) ---
        u2 = v.u.ravel()
        groups["kickturn"] = -u2[self.kick_idx] * un.u

        # --- time monotonicity (con_init_terminal_knot.py:408-421) ---
        ti = jnp.asarray(np.asarray(self.time_ineq_rows, dtype=np.int32))
        groups["time"] = v.t[ti + 1] - v.t[ti]

        # --- waypoint boxes ---
        wq = self._waypoint_quantities(v)
        groups["posLLH"] = self._waypoint_residuals(self.wp_ineq_rows, wq,
                                                    kinds=(0, 1, 2, 3))
        groups["iip"] = self._waypoint_residuals(self.wp_ineq_rows, wq,
                                                 kinds=(4, 5))

        # --- antenna elevation (con_waypoint.py:45-105) ---
        ant = []
        for i, pos_ant, sin_min in self.antenna_rows:
            xa = int(self.ps.x_section_starts[i])
            # 2-wide batch to use the accurate vector transcendental path
            pos2 = jnp.stack([v.pos[xa], v.pos[xa]]) * un.position
            t2 = jnp.stack([v.t[i], v.t[i]]) * un.t
            pos_ecef = eci2ecef(pos2, t2)
            d = normalize(pos_ecef - jnp.asarray(pos_ant), eps=1e-30)
            vert = quatrot(quat_nedg2ecef(jnp.stack([jnp.asarray(pos_ant)] * 2)),
                           jnp.asarray([0.0, 0.0, -1.0]))
            sin_elv = jnp.sum(d * vert, axis=-1)[0]
            ant.append(sin_elv - sin_min)
        groups["antenna"] = (jnp.stack(ant) if ant else jnp.zeros(0))

        # --- user inequality ---
        if self.user_inequality is not None:
            res = self.user_inequality(UserContext(self, v))
            if res is not None:
                groups["user"] = jnp.atleast_1d(jnp.asarray(res))

        return groups

    # --- waypoint helpers ---

    def _waypoint_quantities(self, v: Vars):
        """LLH / downrange / IIP at configured section-start knots."""
        if not self.wp_sections:
            return None
        un = self.units
        secs = np.asarray(self.wp_sections, dtype=np.int32)
        xa = jnp.asarray(self.ps.x_section_starts)[jnp.asarray(secs)]
        pos = v.pos[xa] * un.position
        vel = v.vel[xa] * un.velocity
        t_phys = v.t[jnp.asarray(secs)] * un.t
        llh = eci2geodetic(pos, t_phys)
        lc = self.mission.launch
        dr = distance_vincenty(lc["lat"], lc["lon"], llh[:, 0], llh[:, 1])
        pos_ecef = eci2ecef(pos, t_phys)
        vel_ecef = vel_eci2ecef(vel, pos, t_phys)
        iip = posLLH_IIP_FAA(pos_ecef, vel_ecef)
        sec_to_slot = {int(s): k for k, s in enumerate(self.wp_sections)}
        return dict(llh=llh, downrange=dr, iip=iip, slot=sec_to_slot)

    def _waypoint_residuals(self, rows, wq, kinds):
        out = []
        for sec, qty, mode, val in rows:
            if qty not in kinds:
                continue
            k = wq["slot"][sec]
            if qty == 0:
                raw, scale = wq["llh"][k, 0], 1.0 / 90.0
            elif qty == 1:
                raw, scale = wq["llh"][k, 1], 1.0 / 180.0
            elif qty == 2:
                raw, scale = wq["llh"][k, 2], None  # ratio form
            elif qty == 3:
                raw, scale = wq["downrange"][k], None
            elif qty == 4:
                raw, scale = wq["iip"][k, 0], 1.0 / 90.0
            else:
                raw, scale = wq["iip"][k, 1], 1.0 / 180.0

            if scale is None:  # altitude / downrange use ratio normalization
                r = raw / val - 1.0
                res = r if mode in ("exact", "min") else -r
            else:
                r = (raw - val) * scale
                res = r if mode in ("exact", "min") else -r
            out.append(res)
        return jnp.stack(out) if out else jnp.zeros(0)

    # ------------------------------------------------------------------
    # flat constraint interfaces

    def eq_constraints(self, z, case=None):
        g = self.eq_constraint_groups(z, case)
        return jnp.concatenate([v for v in g.values() if v.size])

    def ineq_constraints(self, z, case=None):
        g = self.ineq_constraint_groups(z, case)
        return jnp.concatenate([v for v in g.values() if v.size])

    def var_sections(self):
        """Per-variable section id [n_z] (int).

        Every variable belongs to exactly one section: state/control nodes
        via the SectionStack index ranges, knot time t_j to the section it
        starts (t_S to the last).  This is the map the structured KKT's row
        grouping uses — the TPU-native stand-in for the reference's
        hand-maintained ``wrt`` block map
        (Trajectory_Optimization.py:358-381).
        """
        ps, S = self.ps, self.S
        x_sec = np.zeros(self.M, dtype=np.int32)
        u_sec = np.zeros(self.N, dtype=np.int32)
        for i in range(S):
            ua, ub, xa, xb, n = ps.get_index(i)
            x_sec[xa:xb] = i
            u_sec[ua:ub] = i
        t_sec = np.minimum(np.arange(S + 1), S - 1).astype(np.int32)
        return np.concatenate([
            x_sec, np.repeat(x_sec, 3), np.repeat(x_sec, 3),
            np.repeat(x_sec, 4), np.repeat(u_sec, 2), t_sec,
        ])

    def solver_funcs(self, colored=False, structured=False, z0=None):
        """Problem-function dict for the IP solver.

        The returned functions take ``(z, case)`` (the solver's aux channel;
        ``()``/None selects the nominal case).  With ``colored=True`` the
        constraint Jacobians are compressed by distance-2 column coloring
        (solver/coloring.py) — the TPU-native replacement for the
        reference's hand-written `wrt` sparsity map
        (Trajectory_Optimization.py:358-381); ``z0`` is the pattern-probe
        point (defaults to the nominal initial guess).  With
        ``structured=True`` the dict carries ``struct_meta`` (equality-row
        section grouping) enabling ``IPOptions(kkt_method="struct")``.
        The structural probes run pinned to a host CPU device so they never
        trigger a fresh accelerator compile (the probe is one-time host
        work; the pattern is platform-independent).
        """
        funcs = {
            "obj": lambda z, c: self.objective(z, c),
            "eq": lambda z, c: self.eq_constraints(z, c),
            "ineq": lambda z, c: self.ineq_constraints(z, c),
            "_aux": True,
        }
        if not (colored or structured):
            return funcs

        from . import initial_guess as ig
        from .solver.coloring import (jacobian_pattern, greedy_color,
                                      make_colored_jacfwd)

        if z0 is None:
            z0 = ig.initial_guess(self)
        cached = _load_pattern_cache(self, z0)
        if cached is not None:
            pat_eq, pat_in = cached
        else:
            try:
                cpu = jax.devices("cpu")[0]
                ctx = jax.default_device(cpu)
            except RuntimeError:
                import contextlib
                ctx = contextlib.nullcontext()
            with ctx:
                pat_eq = jacobian_pattern(funcs["eq"], z0)
                pat_in = jacobian_pattern(funcs["ineq"], z0)
            _store_pattern_cache(self, z0, pat_eq, pat_in)
        if colored:
            color_e = greedy_color(pat_eq)
            color_i = greedy_color(pat_in)
            funcs["jac_eq"] = make_colored_jacfwd(funcs["eq"], pat_eq, color_e)
            funcs["jac_ineq"] = make_colored_jacfwd(funcs["ineq"], pat_in,
                                                    color_i)
            funcs["coloring_info"] = dict(
                eq=dict(n_colors=int(color_e.max()) + 1, m=pat_eq.shape[0]),
                ineq=dict(n_colors=int(color_i.max()) + 1, m=pat_in.shape[0]))
        if structured:
            from .solver.structured import build_struct_meta

            funcs["struct_meta"] = build_struct_meta(pat_eq, pat_in,
                                                     self.var_sections())
        return funcs

    def group_sizes(self, z0):
        """Probe per-group row counts (like the reference's structure probe,
        Trajectory_Optimization.py:354-355)."""
        if self._group_sizes is None:
            ge = {k: int(v.size) for k, v in self.eq_constraint_groups(z0).items()}
            gi = {k: int(v.size) for k, v in self.ineq_constraint_groups(z0).items()}
            self._group_sizes = (ge, gi)
        return self._group_sizes


class UserContext:
    """Accessors handed to user-defined constraints (replaces
    lib/usercon_tools.py; values are *dimensional* like the reference)."""

    def __init__(self, problem: Problem, v: Vars):
        self._p = problem
        self._v = v

    def value(self, section_name, key):
        """State/control/time at the section-start knot
        (usercon_tools.get_value, lib/usercon_tools.py:76-110)."""
        p, v = self._p, self._v
        i = p.mission.events.index[section_name]
        un = p.units
        if key == "t":
            return v.t[i] * un.t
        ua, ub, xa, xb, n = p.ps.get_index(i)
        if key == "mass":
            return v.mass[xa] * un.mass
        if key == "position":
            return v.pos[xa] * un.position
        if key == "velocity":
            return v.vel[xa] * un.velocity
        if key == "quaternion":
            return v.quat[xa]
        if key == "u":
            return v.u[ua] * un.u
        raise KeyError(key)

    def section_values(self, section_name, key):
        """All nodes of a section (usercon_tools.get_values_section)."""
        p, v = self._p, self._v
        i = p.mission.events.index[section_name]
        un = p.units
        ua, ub, xa, xb, n = p.ps.get_index(i)
        if key == "t":
            t_x, _ = p._time_grids(v.t)
            return t_x[i, : n + 1] * un.t
        if key == "mass":
            return v.mass[xa:xb] * un.mass
        if key == "position":
            return v.pos[xa:xb] * un.position
        if key == "velocity":
            return v.vel[xa:xb] * un.velocity
        if key == "quaternion":
            return v.quat[xa:xb]
        if key == "u":
            return v.u[ua:ub] * un.u
        raise KeyError(key)
