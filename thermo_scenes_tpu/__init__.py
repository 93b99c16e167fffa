"""ThermoScenes dataset tooling (equivalent of the reference's thermo_scenes
package): FLIR MSX extraction, dataset preprocessing, COLMAP glue, and
visualization — all offline host-side CPU tooling."""
