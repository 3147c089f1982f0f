"""Mission configuration: settings JSON + events/wind/CA CSVs → typed struct.

Input schema is identical to the reference's
(/root/reference/Trajectory_Optimization.py:49-177,
example/example-settings.json, example/example-events.csv) so existing GELATO
mission files run unchanged.  All parsing happens host-side in NumPy; the
result is a plain dataclass of static arrays and metadata.
"""

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

G0 = 9.80665

# Attitude-mode codes (reference strings, lib/con_trajectory.py:160-207)
ATT_HOLD = 0  # "hold" / "vertical": u = 0, quaternion constant
ATT_KICK = 1  # "kick-turn" / "pitch": pitch rate constant, yaw rate 0
ATT_PITCH_YAW = 2  # "pitch-yaw": both rates constant
ATT_SAME_RATE = 3  # "same-rate": rates equal previous section's last node
ATT_FREE = 4  # "zero-lift-turn" / "free": unconstrained

_ATT_CODES = {
    "hold": ATT_HOLD,
    "vertical": ATT_HOLD,
    "kick-turn": ATT_KICK,
    "pitch": ATT_KICK,
    "pitch-yaw": ATT_PITCH_YAW,
    "same-rate": ATT_SAME_RATE,
    "zero-lift-turn": ATT_FREE,
    "free": ATT_FREE,
}


@dataclass
class Events:
    """Per-event (= per-section plus terminal knot) parameters as arrays."""

    names: list  # S+1 event names
    time: np.ndarray  # (S+1,) nominal knot times [s]
    time_ref: list  # (S+1,) referenced event name or None
    rocket_stage: np.ndarray  # (S+1,) int
    engine_on: np.ndarray  # (S+1,) bool
    thrust: np.ndarray  # (S+1,) vacuum thrust [N]
    nozzle_area: np.ndarray  # (S+1,) [m^2]
    attitude: list  # (S+1,) attitude strings
    att_code: np.ndarray  # (S+1,) int codes
    pitchrate_init: np.ndarray
    yawrate_init: np.ndarray
    num_nodes: np.ndarray  # (S+1,) int; last entry unused
    # derived (Trajectory_Optimization.py:82-114)
    timeduration: np.ndarray
    mass_jettison: np.ndarray
    massflow: np.ndarray
    reference_area: np.ndarray
    zero_lift_turn: np.ndarray  # bool

    @property
    def index(self):
        return {name: i for i, name in enumerate(self.names)}


@dataclass
class Mission:
    name: str
    settings: dict
    events: Events
    stages: dict
    wind_table: np.ndarray  # (K, 3): altitude, wind_n, wind_e
    ca_table: np.ndarray  # (K, 2): mach, CA
    launch: dict  # lat, lon, altitude, flight_azimuth_init
    terminal: dict
    flight_constraint: dict
    optimization_mode: str
    mass_payload: float
    num_sections: int
    solver_options: dict = field(default_factory=dict)
    initial_trajectory: pd.DataFrame = None
    base_dir: str = "."

    @property
    def m_init(self):
        """Total lift-off mass (Trajectory_Optimization.py:146-148)."""
        m = sum(
            s["mass_dry"] + s["mass_propellant"] for s in self.stages.values()
        )
        if self.optimization_mode != "Payload":
            m += self.mass_payload
        return m


def load_mission(settings_path):
    """Parse a GELATO-format settings JSON and its referenced CSVs."""
    with open(settings_path) as f:
        settings = json.load(f)
    base = os.path.dirname(os.path.abspath(settings_path))

    def _p(rel):
        return rel if os.path.isabs(rel) else os.path.join(base, rel)

    wind = pd.read_csv(_p(settings["Wind file"]))
    # wind direction is the meteorological "from" direction
    # (Trajectory_Optimization.py:56-57)
    wn = wind["wind_speed[m/s]"] * -np.cos(np.radians(wind["direction[deg]"]))
    we = wind["wind_speed[m/s]"] * -np.sin(np.radians(wind["direction[deg]"]))
    wind_table = np.column_stack(
        [wind["altitude[m]"].to_numpy(float), wn.to_numpy(float), we.to_numpy(float)]
    )

    ca_table = pd.read_csv(_p(settings["CA file"])).to_numpy(float)

    ev = pd.read_csv(_p(settings["Event setting file"]), index_col=0)
    names = list(ev.index)
    n_ev = len(names)
    stages = settings["RocketStage"]

    time = ev["time"].to_numpy(float)
    timeduration = np.empty(n_ev)
    timeduration[:-1] = np.diff(time)
    timeduration[-1] = 9000.0

    time_ref = []
    for v in ev["time_ref"].tolist():
        time_ref.append(v if isinstance(v, str) and v in names else None)

    engine_on = ev["engineOn"].astype(str).str.strip().str.lower().isin(["true", "1"]).to_numpy()
    thrust = ev["thrust"].to_numpy(float)
    nozzle_area = ev["nozzle_area"].to_numpy(float)
    attitude = [str(a).strip() for a in ev["attitude"].tolist()]
    for a in attitude:
        if a not in _ATT_CODES:
            raise ValueError(f"unknown attitude option: {a!r}")
    att_code = np.array([_ATT_CODES[a] for a in attitude], dtype=np.int32)
    rocket_stage = ev["rocketStage"].to_numpy(int)

    mass_jettison = np.zeros(n_ev)
    for key, stage in stages.items():
        sep = stage.get("separation_at")
        if sep is not None:
            if sep in names:
                mass_jettison[names.index(sep)] = stage["mass_dry"]
            else:
                print(f"WARNING: separation time is invalid : stage {key}")
        for dkey, item in (stage.get("dropMass") or {}).items():
            if item["separation_at"] in names:
                mass_jettison[names.index(item["separation_at"])] = item["mass"]
            else:
                print(f"WARNING: separation time is invalid : {dkey}")

    massflow = np.zeros(n_ev)
    reference_area = np.zeros(n_ev)
    for i in range(n_ev):
        stage = stages[str(rocket_stage[i])]
        reference_area[i] = stage["reference_area"]
        if engine_on[i]:
            massflow[i] = thrust[i] / stage["Isp_vac"] / G0

    events = Events(
        names=names,
        time=time,
        time_ref=time_ref,
        rocket_stage=rocket_stage,
        engine_on=engine_on,
        thrust=thrust,
        nozzle_area=nozzle_area,
        attitude=attitude,
        att_code=att_code,
        pitchrate_init=ev["pitchrate_init"].to_numpy(float),
        yawrate_init=ev["yawrate_init"].to_numpy(float),
        num_nodes=ev["num_nodes"].to_numpy(int),
        timeduration=timeduration,
        mass_jettison=mass_jettison,
        massflow=massflow,
        reference_area=reference_area,
        zero_lift_turn=np.array([a == "zero-lift-turn" for a in attitude]),
    )

    init_traj = None
    itf = settings.get("Initial trajectory file")
    if itf:
        init_traj = pd.read_csv(_p(itf))

    solver_options = {}
    for key in ("IPOPT", "SNOPT", "GIP"):
        if key in settings:
            solver_options[key] = settings[key]

    return Mission(
        name=settings.get("name", "mission"),
        settings=settings,
        events=events,
        stages=stages,
        wind_table=wind_table,
        ca_table=ca_table,
        launch=settings["LaunchCondition"],
        terminal=settings["TerminalCondition"],
        flight_constraint=settings.get("FlightConstraint", {}),
        optimization_mode=settings.get("OptimizationMode", "Time"),
        mass_payload=float(settings.get("mass_payload", 0.0)),
        num_sections=n_ev - 1,
        solver_options=solver_options,
        initial_trajectory=init_traj,
        base_dir=base,
    )
