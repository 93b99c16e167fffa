"""Pure-function JAX/Pallas compute ops (the TPU-native equivalent of the
reference's tiny-cuda-nn / nerfacc / nerfstudio model_components layer)."""
