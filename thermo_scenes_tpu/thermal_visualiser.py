"""Interactive thermal hover tool.

Equivalent of thermo_scenes/flir_thermal_images/thermal_visualiser.py:4-59:
display a grayscale thermal image; hovering shows the denormalized
temperature (pixel * (max - min) + min).
"""

from __future__ import annotations

import matplotlib.pyplot as plt


class ThermalVisualiser:
    def __init__(self, thermal_image, max_temperature, min_temperature) -> None:
        self.thermal_image = thermal_image
        self.max_temperature = max_temperature
        self.min_temperature = min_temperature
        self.fig, self.ax = plt.subplots()
        self.ax.imshow(self.thermal_image, cmap="gray")
        self.annot = self.ax.annotate(
            "",
            xy=(0, 0),
            xytext=(-20, 20),
            textcoords="offset points",
            bbox=dict(boxstyle="round", fc="w"),
            arrowprops=dict(arrowstyle="->"),
        )
        self.annot.set_visible(False)

    def update_temperature(self, pixel_value: float) -> float:
        """Denormalize a [0,1] pixel value to degC."""
        return pixel_value * (self.max_temperature - self.min_temperature) + (
            self.min_temperature
        )

    def hover(self, event: object) -> None:
        if event.inaxes == self.ax:
            x, y = int(event.xdata), int(event.ydata)
            pixel_value = self.thermal_image[y, x]
            temperature = self.update_temperature(pixel_value)
            self.annot.xy = (x, y)
            self.annot.set_text(f"Temperature: {temperature:.2f}")
            self.annot.get_bbox_patch().set_alpha(0.4)
            self.annot.set_visible(True)
            self.fig.canvas.draw_idle()
