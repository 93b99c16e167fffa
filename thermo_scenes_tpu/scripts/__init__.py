"""CLI entry points (equivalent of thermo_scenes/scripts/)."""
