"""Field networks and model forward passes (the TPU-native equivalent of the
reference's L3/L4 layers: thermal_field.py, density_fields, thermal_nerf_model)."""
