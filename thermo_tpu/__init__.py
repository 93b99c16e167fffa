"""thermo-tpu: TPU-native joint RGB + thermal neural radiance fields.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Schindler-EPFL-Lab/thermo-nerf (a nerfstudio/PyTorch overlay): a
shared-density nerfacto-style hash-grid field with separate RGB and
thermal heads where both modalities backpropagate into the shared
geometry, hierarchical proposal-network ray sampling, fused compositing,
temperature-bounds normalization, and multi-host ray-sharded training
via jax.sharding/pjit.
"""

__version__ = "0.1.0"
