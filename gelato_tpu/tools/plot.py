"""Trajectory dashboards (matplotlib).

Functional parity with /root/reference/tools/plot_output.py:30-197 —
altitude/apsides, orbital elements, NED ground speed, angle of attack, ground
track, thrust vector, Euler angles, and a 3-D ECI view — drawn from the
result DataFrame of :func:`gelato_tpu.output.output_result`.

Usage: ``python -m gelato_tpu.tools.plot result.csv [--save prefix]``.
"""

import argparse

import numpy as np


def display_6DoF(out, save_prefix=None):
    import matplotlib

    if save_prefix:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = out["time"].to_numpy()

    fig, axes = plt.subplots(3, 2, figsize=(12, 12))

    ax = axes[0, 0]
    ax.plot(t, out["altitude"] / 1000.0, label="altitude")
    ax.plot(t, out["altitude_apogee"] / 1000.0, label="apogee", ls="--")
    ax.plot(t, out["altitude_perigee"] / 1000.0, label="perigee", ls="--")
    ax.set_ylim(bottom=min(0.0, float(out["altitude"].min()) / 1000.0))
    ax.set_ylabel("altitude [km]")
    ax.grid(True)
    ax.legend()

    ax = axes[0, 1]
    ax.plot(t, out["inclination"], label="inclination")
    ax.plot(t, out["lon_ascending_node"], label="RAAN", ls="--")
    ax.set_ylabel("orbital elements [deg]")
    ax.grid(True)
    ax.legend()

    ax = axes[1, 0]
    for c, lbl in (("vel_ground_NED_X", "N"), ("vel_ground_NED_Y", "E"),
                   ("vel_ground_NED_Z", "D")):
        ax.plot(t, out[c], label=lbl)
    ax.plot(t, out["vel_ground"], label="|v_ground|", color="k", lw=0.8)
    ax.set_ylabel("ground velocity NED [m/s]")
    ax.grid(True)
    ax.legend()

    ax = axes[1, 1]
    ax.plot(t, out["AOA_total"], label="total")
    ax.plot(t, out["AOA_pitch"], label="pitch", ls="--")
    ax.plot(t, out["AOA_yaw"], label="yaw", ls="--")
    ax2 = ax.twinx()
    ax2.plot(t, out["dynamic_pressure"] / 1000.0, color="tab:red", lw=0.8)
    ax2.set_ylabel("dynamic pressure [kPa]", color="tab:red")
    ax.set_ylabel("AOA [deg]")
    ax.grid(True)
    ax.legend()

    ax = axes[2, 0]
    ax.plot(out["lon"], out["lat"], label="ground track (PPI)")
    ok = np.isfinite(out["lon_IIP"].to_numpy())
    ax.plot(out["lon"][ok], out["lat_IIP"][ok] * 0 + out["lat_IIP"][ok],
            ls="", marker=".", ms=2, label="IIP")
    ev_mask = out["event"] != ""
    ax.plot(out["lon"][ev_mask], out["lat"][ev_mask], "k^", ms=5)
    ax.set_xlabel("longitude [deg]")
    ax.set_ylabel("latitude [deg]")
    ax.grid(True)
    ax.legend()

    ax = axes[2, 1]
    ax.plot(t, out["heading_NED2BODY"], label="heading")
    ax.plot(t, out["pitch_NED2BODY"], label="pitch")
    ax.plot(t, out["roll_NED2BODY"], label="roll")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("Euler NED→body [deg]")
    ax.grid(True)
    ax.legend()

    fig.tight_layout()
    if save_prefix:
        fig.savefig(f"{save_prefix}-dashboard.png", dpi=120)
        plt.close(fig)
    else:
        plt.show()


def display_3d(out, save_prefix=None):
    import matplotlib

    if save_prefix:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    re = 6378137.0
    u, v = np.mgrid[0:2 * np.pi:40j, 0:np.pi:20j]
    ax.plot_wireframe(re * np.cos(u) * np.sin(v), re * np.sin(u) * np.sin(v),
                      re * np.cos(v), color="lightgray", lw=0.3)
    ax.plot(out["pos_ECI_X"], out["pos_ECI_Y"], out["pos_ECI_Z"], color="tab:red")
    ax.set_box_aspect((1, 1, 1))
    if save_prefix:
        fig.savefig(f"{save_prefix}-3d.png", dpi=120)
        plt.close(fig)
    else:
        plt.show()


def main(argv=None):
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("csv")
    parser.add_argument("--save", default=None, help="save PNGs with this prefix")
    parser.add_argument("--three-d", action="store_true")
    args = parser.parse_args(argv)
    out = pd.read_csv(args.csv)
    display_6DoF(out, args.save)
    if args.three_d:
        display_3d(out, args.save)


if __name__ == "__main__":
    main()
