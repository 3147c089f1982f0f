"""Google Earth KML export of the ground track (PPI) and IIP track.

Parity with /root/reference/tools/make_kml.py:36-66, but emitting KML XML
directly (no simplekml dependency in this environment).

Usage: ``python -m gelato_tpu.tools.kml result.csv [-o out.kml]``.
"""

import argparse
from xml.sax.saxutils import escape

import numpy as np


def _linestring(name, coords, color):
    pts = " ".join(f"{lon:.6f},{lat:.6f},0" for lat, lon in coords)
    return (
        f"<Placemark><name>{escape(name)}</name>"
        f"<Style><LineStyle><color>{color}</color><width>2</width></LineStyle></Style>"
        f"<LineString><tessellate>1</tessellate><coordinates>{pts}</coordinates>"
        f"</LineString></Placemark>"
    )


def _point(name, lat, lon):
    return (
        f"<Placemark><name>{escape(name)}</name><Point>"
        f"<coordinates>{lon:.6f},{lat:.6f},0</coordinates></Point></Placemark>"
    )


def make_kml(out, path):
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>',
        _linestring("ground track (PPI)",
                    list(zip(out["lat"], out["lon"])), "ff00a5ff"),
    ]
    ok = np.isfinite(out["lat_IIP"].to_numpy()) & np.isfinite(out["lon_IIP"].to_numpy())
    if ok.any():
        parts.append(_linestring(
            "IIP track",
            list(zip(out["lat"][ok], out["lon"][ok])), "ff0000ff"))
    ev = out[out["event"].astype(str).str.len() > 0]
    for _, row in ev.iterrows():
        parts.append(_point(str(row["event"]), row["lat"], row["lon"]))
    parts.append("</Document></kml>")
    with open(path, "w") as f:
        f.write("\n".join(parts))


def main(argv=None):
    import pandas as pd

    parser = argparse.ArgumentParser()
    parser.add_argument("csv")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args(argv)
    out = pd.read_csv(args.csv)
    path = args.output or args.csv.replace(".csv", ".kml")
    make_kml(out, path)
    print(f"KML written to {path}")


if __name__ == "__main__":
    main()
