"""Host-side utilities: colormaps, image IO, CLI, tracking."""
