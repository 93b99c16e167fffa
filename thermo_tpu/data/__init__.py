"""Data layer: transforms.json parsing, cameras/ray generation, image loading,
device-resident ray batching (the TPU-native equivalent of the reference's L1
data layer + nerfstudio's VanillaDataManager)."""
