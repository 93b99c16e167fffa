"""Small fused MLPs.

TPU-native replacement for tiny-cuda-nn's FullyFusedMLP / nerfstudio
``field_components/mlp.py``. On TPU there is nothing to hand-fuse: XLA fuses
the (batch x 64) matmul chains onto the MXU with the surrounding elementwise
ops; we express them as plain flax Dense stacks with a configurable compute
dtype (bfloat16 by default, mirroring the reference's mixed_precision=True).

``num_layers`` counts Dense layers like nerfstudio's MLP: num_layers=2 means
in -> width -> out.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


class MLP(nn.Module):
    num_layers: int
    layer_width: int
    out_dim: int
    activation: Callable[[Array], Array] = nn.relu
    out_activation: Optional[Callable[[Array], Array]] = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.layer_width, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            x = self.activation(x)
        x = nn.Dense(self.out_dim, dtype=self.compute_dtype, name=f"dense_{self.num_layers - 1}")(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x
