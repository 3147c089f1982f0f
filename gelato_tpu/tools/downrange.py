"""Add a Vincenty downrange column to a trajectory CSV.

Parity with the reference's CLI tool (/root/reference/lib/downrange.py:114-128):
reads a CSV with lat/lon columns, computes the geodesic distance from the
first row's position, writes the file back in place (with a .backup copy).

Usage: ``python -m gelato_tpu.tools.downrange result.csv``
"""

import argparse
import shutil

import numpy as np


def add_downrange(df):
    import jax

    cpu = jax.devices("cpu")[0]
    from gelato_tpu.ops.earth import distance_vincenty

    lat0 = float(df["lat"].iloc[0])
    lon0 = float(df["lon"].iloc[0])
    with jax.default_device(cpu):
        dr = np.asarray(distance_vincenty(
            lat0, lon0, df["lat"].to_numpy(float), df["lon"].to_numpy(float)))
    df["downrange"] = dr
    return df


def main(argv=None):
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("csv")
    args = parser.parse_args(argv)
    df = pd.read_csv(args.csv)
    df = add_downrange(df)
    shutil.copy(args.csv, args.csv + ".backup")
    df.to_csv(args.csv, index=False)
    print(f"downrange column written to {args.csv} (backup saved)")


if __name__ == "__main__":
    main()
