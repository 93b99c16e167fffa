"""CLI entry points (equivalent of thermo_nerf/scripts/)."""
