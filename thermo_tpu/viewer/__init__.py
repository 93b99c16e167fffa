"""Interactive viewer (HTTP) for trained thermal NeRF checkpoints."""
