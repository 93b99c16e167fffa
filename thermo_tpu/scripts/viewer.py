"""Interactive viewer CLI.

Equivalent of thermo_nerf/scripts/thermal_viewer.py:29-64: load a trained
checkpoint and serve an interactive view (HTTP instead of viser/websocket).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

from thermo_tpu.utils.cli import parse_cli


@dataclasses.dataclass
class ViewerParameters:
    """Serve an interactive viewer for a trained thermal NeRF."""

    model_path: Path = Path("./outputs")
    data: Optional[Path] = None
    port: int = 7007
    height: int = 480
    width: int = 640


def main(p: ViewerParameters) -> None:
    from thermo_tpu.engine.pipeline import load_pipeline_from_dir
    from thermo_tpu.viewer.server import ViewerServer

    pipe = load_pipeline_from_dir(p.model_path, data=p.data, load_eval=False)
    ViewerServer(pipe, height=p.height, width=p.width, port=p.port).serve_forever()


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(ViewerParameters))


if __name__ == "__main__":
    cli()
