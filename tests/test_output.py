"""Output writer tests: column parity with the reference result CSV."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu.output import output_result, result_summary  # noqa: E402
from gelato_tpu import initial_guess as ig  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SETTINGS), reason="reference example data not available"
)

# the column set of the reference writer (output_result.py:67-121)
REFERENCE_COLUMNS = [
    "event", "time", "stage", "section", "thrust", "mass", "lat", "lon",
    "lat_IIP", "lon_IIP", "downrange", "altitude", "altitude_apogee",
    "altitude_perigee", "inclination", "argument_perigee",
    "lon_ascending_node", "true_anomaly", "pos_ECI_X", "pos_ECI_Y",
    "pos_ECI_Z", "vel_ECI_X", "vel_ECI_Y", "vel_ECI_Z", "vel_ground_NED_X",
    "vel_ground_NED_Y", "vel_ground_NED_Z", "quat_ECI2BODY_0",
    "quat_ECI2BODY_1", "quat_ECI2BODY_2", "quat_ECI2BODY_3", "accel_BODY_X",
    "aero_BODY_X", "heading_NED2BODY", "pitch_NED2BODY", "roll_NED2BODY",
    "vel_inertial", "flightpath_vel_inertial_geocentric",
    "azimuth_vel_inertial_geocentric", "thrust_direction_ECI_X",
    "thrust_direction_ECI_Y", "thrust_direction_ECI_Z", "rate_BODY_X",
    "rate_BODY_Y", "rate_BODY_Z", "vel_ground", "vel_air", "AOA_total",
    "AOA_pitch", "AOA_yaw", "dynamic_pressure", "Q_alpha", "M",
]


@pytest.fixture(scope="module")
def result_df():
    problem = Problem(load_mission(SETTINGS))
    z0 = ig.initial_guess(problem)
    return problem, output_result(problem, z0)


class TestOutputResult:
    def test_column_parity(self, result_df):
        _, df = result_df
        assert list(df.columns) == REFERENCE_COLUMNS

    def test_row_count_and_finiteness(self, result_df):
        problem, df = result_df
        assert len(df) == problem.M
        numeric = df.drop(columns=["event", "stage"])
        # IIP columns may legitimately be NaN on orbital segments
        no_nan = numeric.drop(columns=["lat_IIP", "lon_IIP"])
        assert np.isfinite(no_nan.to_numpy(float)).all()

    def test_launch_row_values(self, result_df):
        problem, df = result_df
        lc = problem.mission.launch
        np.testing.assert_allclose(df["lat"].iloc[0], lc["lat"], atol=1e-4)
        np.testing.assert_allclose(df["lon"].iloc[0], lc["lon"], atol=1e-4)
        np.testing.assert_allclose(df["downrange"].iloc[0], 0.0, atol=5.0)
        assert df["event"].iloc[0] == "LIFTOFF"

    def test_summary_lines(self, result_df):
        problem, df = result_df
        z0 = ig.initial_guess(problem)
        lines = result_summary(problem, z0, {"converged": True,
                                             "status": "optimal",
                                             "iterations": 1, "err": 1e-7})
        text = "".join(lines)
        assert "initial mass" in text and "payload" in text
        assert "CONVERGED" in text
