"""Interactive temperature readout for normalized thermal images.

Capability parity with the reference hover tool
(thermo_scenes/flir_thermal_images/thermal_visualiser.py): display a
grayscale thermal image whose pixels are normalized to [0, 1] against the
dataset temperature bounds, and show the temperature in degC under the
cursor. Implemented here as a closure-based mpl callback plus a tiny facade
class for the CLI/tests; the readout is rendered in the axes title rather
than a floating annotation.
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np


def pixel_to_celsius(value: float, min_temperature: float, max_temperature: float) -> float:
    """Map a normalized [0, 1] pixel value back to degrees Celsius."""
    return min_temperature + float(value) * (max_temperature - min_temperature)


def make_hover_callback(fig, ax, image, min_temperature: float, max_temperature: float):
    """Build a ``motion_notify_event`` callback that reports the cursor temperature.

    The callback reads the pixel under the cursor (first channel if the image
    has one), converts it with :func:`pixel_to_celsius`, and writes the value
    into the axes title.
    """
    image = np.asarray(image)

    def on_move(event) -> None:
        if event.inaxes is not ax or event.xdata is None or event.ydata is None:
            return
        col, row = int(event.xdata), int(event.ydata)
        if not (0 <= row < image.shape[0] and 0 <= col < image.shape[1]):
            return
        value = image[row, col]
        if np.ndim(value):  # RGB(A) png of a grayscale image: channels agree
            value = value.flat[0]
        celsius = pixel_to_celsius(value, min_temperature, max_temperature)
        ax.set_title(f"({col}, {row}): {celsius:.2f} degC")
        fig.canvas.draw_idle()

    return on_move


class ThermalVisualiser:
    """Figure + hover callback bundle (facade over the functions above)."""

    def __init__(self, thermal_image, max_temperature: float, min_temperature: float) -> None:
        self.thermal_image = np.asarray(thermal_image)
        self.max_temperature = max_temperature
        self.min_temperature = min_temperature
        self.fig, self.ax = plt.subplots()
        self.ax.imshow(self.thermal_image, cmap="gray", vmin=0.0, vmax=1.0)
        self.hover = make_hover_callback(
            self.fig, self.ax, self.thermal_image, min_temperature, max_temperature
        )

    def update_temperature(self, pixel_value: float) -> float:
        """Denormalize one [0, 1] pixel value to degC."""
        return pixel_to_celsius(pixel_value, self.min_temperature, self.max_temperature)
