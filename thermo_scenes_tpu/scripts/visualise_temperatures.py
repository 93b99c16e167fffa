"""Open one thermal image + bounds JSON with the hover visualiser.

Equivalent of thermo_scenes/scripts/visualise_temperatures.py:10-45.
"""

from __future__ import annotations

import argparse
import json

import matplotlib.pyplot as plt

from thermo_scenes_tpu.thermal_visualiser import ThermalVisualiser


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path_to_thermal_image")
    p.add_argument("path_to_json_file")
    a = p.parse_args()

    thermal_image = plt.imread(a.path_to_thermal_image)
    bounds = json.loads(open(a.path_to_json_file).read())
    mx = bounds["absolute_max_temperature"]
    mn = bounds["absolute_min_temperature"]
    if mx < mn:
        mx, mn = mn, mx
    vis = ThermalVisualiser(thermal_image, mx, mn)
    vis.fig.canvas.mpl_connect("motion_notify_event", vis.hover)
    plt.show()


if __name__ == "__main__":
    cli()
