"""Radiance + thermal fields.

TPU-native equivalents of:
  * nerfstudio ``fields/nerfacto_field.py`` NerfactoField (hash grid ->
    density trunk -> geo features; SH direction encoding + appearance
    embedding -> color head),
  * thermo_nerf/thermal_nerf/thermal_field.py ``ThermalNerfactoTField``
    (adds a view-independent thermal branch: MLP 2x64 ReLU with Sigmoid
    output -> Linear 64->1 with NO activation, thermal_field.py:90-102 and
    thermal_field_head.py:21-51; gradient gate ``pass_thermal_gradients``
    via stop_gradient, thermal_field.py:171-173),
  * thermo_nerf/rgb_concat/concat_field.py ``ConcatNerfactoTField`` (color
    head widened to 4 outputs = RGBT, Sigmoid).

Flax modules over the pure ops in ``thermo_tpu.ops``; parameters are plain
pytrees so the trainer can shard/label them (group "fields").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from thermo_tpu.models.mlp import MLP
from thermo_tpu.ops.contraction import contract_to_unit_cube, normalize_with_aabb
from thermo_tpu.ops.hash_encoding import HashGridSpec, hash_encode
from thermo_tpu.ops.lowrank import cp_encode, init_cp_lines
from thermo_tpu.ops.triplane import init_triplanes, triplane_encode
from thermo_tpu.ops.math import normalize, trunc_exp
from thermo_tpu.ops.sh import sh_dim, sh_encoding


class HashEncoding(nn.Module):
    """Parameter holder for one multires hash table.

    ``grad_corners`` / ``fwd_corners``: stochastic-corner modes (0 = exact
    trilinear); see ``thermo_tpu.ops.hash_encoding.hash_encode``.
    """

    spec: HashGridSpec
    param_dtype: jnp.dtype = jnp.float32
    grad_corners: int = 0
    fwd_corners: int = 0
    grad_levels: int = 0

    @nn.compact
    def __call__(self, positions: Array, exact: bool = False) -> Array:
        # The parameter is stored CHANNELS-FIRST FLAT [F, L*T] — the one
        # layout the forward gather (reads [F, L*T] rows), the backward
        # column scatter (writes [F]-wide columns), and the Adam update
        # (elementwise, huge axis minor -> perfect T(8,128) tiling, no
        # padding) all share, so no relayout copies appear in the train step
        # (round-3 trace finding; earlier [L,T,F] storage was a measured 64x
        # padded-tiling HBM OOM, and flat [L, T*F] cost ~6ms/step in
        # scatter-output <-> optimizer relayouts).
        spec = self.spec
        table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key,
                (spec.features_per_level, spec.num_levels * spec.table_size),
                dtype=self.param_dtype,
                minval=-1e-4,
                maxval=1e-4,
            ),
        )
        return hash_encode(
            table,
            positions,
            spec,
            grad_corners=0 if exact else self.grad_corners,
            fwd_corners=0 if exact else self.fwd_corners,
            grad_levels=0 if exact else self.grad_levels,
        )


class ThermalNerfactoField(nn.Module):
    """Shared-density field with RGB and thermal heads.

    ``mode``:
      * "thermal": separate RGB (3, view-dependent) and thermal (1,
        view-independent) heads — ThermalNerfactoTField.
      * "rgb": RGB head only — plain NerfactoField (nerfacto / thermal-as-RGB
        baseline).
      * "concat": single 4-channel RGBT head — ConcatNerfactoTField.
    """

    aabb: tuple  # ((xmin,ymin,zmin),(xmax,ymax,zmax)); static
    num_images: int
    mode: str = "thermal"
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    features_per_level: int = 2
    hidden_dim_color: int = 64
    hidden_dim_thermal: int = 64  # reference reuses hidden_dim_transient=64
    appearance_embedding_dim: int = 32
    use_average_appearance_embedding: bool = True
    use_contraction: bool = True
    average_init_density: float = 1.0
    sh_levels: int = 4
    pass_thermal_gradients: bool = True
    pass_rgb_gradients: bool = True  # thermal_field.py:106 (always True)
    use_transient_embedding: bool = False
    transient_embedding_dim: int = 16
    num_layers_transient: int = 2
    use_pred_normals: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    hash_grad_corners: int = 0  # 0 = exact table gradients
    hash_fwd_corners: int = 0  # 0 = exact trilinear forward (training knob)
    hash_grad_levels: int = 0  # 0 = table grads update all levels

    def setup(self):
        self.grid = HashEncoding(
            spec=HashGridSpec(
                num_levels=self.num_levels,
                features_per_level=self.features_per_level,
                log2_hashmap_size=self.log2_hashmap_size,
                base_res=self.base_res,
                max_res=self.max_res,
            ),
            grad_corners=self.hash_grad_corners,
            fwd_corners=self.hash_fwd_corners,
            grad_levels=self.hash_grad_levels,
        )
        self.mlp_base = MLP(
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
            compute_dtype=self.compute_dtype,
        )
        if self.mode in ("thermal", "rgb"):
            head_out = 3
        elif self.mode == "concat":
            head_out = 4
        else:
            raise ValueError(f"unknown field mode {self.mode!r}")
        self.mlp_head = MLP(
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_dim=head_out,
            out_activation=nn.sigmoid,
            compute_dtype=self.compute_dtype,
        )
        if self.appearance_embedding_dim > 0:
            self.embedding_appearance = nn.Embed(
                self.num_images, self.appearance_embedding_dim
            )
        if self.mode == "thermal":
            # thermal_field.py:90-98 — 2 layers x 64, ReLU, Sigmoid OUTPUT
            # activation on the 64-dim feature...
            self.mlp_thermal = MLP(
                num_layers=2,
                layer_width=64,
                out_dim=self.hidden_dim_thermal,
                out_activation=nn.sigmoid,
                compute_dtype=self.compute_dtype,
            )
            # ...then a single Linear 64 -> 1 with NO activation
            # (thermal_field_head.py:21-51).
            self.thermal_head = nn.Dense(1, dtype=self.compute_dtype)
        if self.use_transient_embedding:
            self.embedding_transient = nn.Embed(
                self.num_images, self.transient_embedding_dim
            )
            self.mlp_transient = MLP(
                num_layers=self.num_layers_transient,
                layer_width=self.hidden_dim_thermal,
                out_dim=self.hidden_dim_thermal,
                compute_dtype=self.compute_dtype,
            )
            self.transient_rgb_head = nn.Dense(3, dtype=self.compute_dtype)
            self.transient_density_head = nn.Dense(1, dtype=self.compute_dtype)
        if self.use_pred_normals:
            self.mlp_pred_normals = MLP(
                num_layers=3,
                layer_width=64,
                out_dim=64,
                compute_dtype=self.compute_dtype,
            )
            self.pred_normals_head = nn.Dense(3, dtype=self.compute_dtype)

    def _normalize_positions(self, positions: Array) -> tuple[Array, Array]:
        """World positions -> [0,1]^3 grid coords + in-bounds selector."""
        if self.use_contraction:
            p = contract_to_unit_cube(positions)
        else:
            p = normalize_with_aabb(positions, jnp.asarray(self.aabb, jnp.float32))
        selector = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        p = p * selector[..., None]
        return p, selector

    def get_density(
        self, positions: Array, exact: bool = False
    ) -> tuple[Array, Array]:
        """positions [..., 3] world -> (density [..., 1] f32, geo_feat [..., G]).

        ``exact=True`` disables the stochastic-corner estimators for this call
        (eval renders and analytic normals use exact trilinear)."""
        p, selector = self._normalize_positions(positions)
        feats = self.grid(p, exact=exact)
        h = self.mlp_base(feats)
        density_before = h[..., :1].astype(jnp.float32)
        geo_feat = h[..., 1:]
        density = self.average_init_density * trunc_exp(density_before)
        density = density * selector[..., None].astype(density.dtype)
        return density, geo_feat

    def get_head_outputs(
        self,
        geo_feat: Array,
        directions: Array,
        camera_indices: Array,
        train: bool = True,
    ) -> dict[str, Array]:
        """geo_feat [..., G]; directions [..., 3] (unit); camera_indices
        [...] int32 (per ray/sample). Returns dict of head outputs in f32."""
        d = sh_encoding(normalize(directions), self.sh_levels).astype(
            self.compute_dtype
        )

        if self.appearance_embedding_dim > 0:
            if train:
                # one-hot matmul instead of nn.Embed's take: the take's VJP
                # is a 196k-index scatter into [num_images, 32] (~1.7ms/step
                # traced); onehot^T @ g is an MXU segment-sum (~free).
                table = self.embedding_appearance.embedding
                onehot = jax.nn.one_hot(
                    camera_indices, table.shape[0], dtype=table.dtype
                )
                embedded = onehot @ table
            else:
                table = self.embedding_appearance.embedding
                if self.use_average_appearance_embedding:
                    mean = jnp.mean(table, axis=0)
                else:
                    mean = jnp.zeros((self.appearance_embedding_dim,), table.dtype)
                embedded = jnp.broadcast_to(
                    mean, (*camera_indices.shape, self.appearance_embedding_dim)
                )
            h = jnp.concatenate(
                [d, geo_feat, embedded.astype(self.compute_dtype)], axis=-1
            )
        else:
            h = jnp.concatenate([d, geo_feat], axis=-1)

        outputs: dict[str, Array] = {}
        head = self.mlp_head(h).astype(jnp.float32)
        if self.mode == "concat":
            outputs["rgbt"] = head
        else:
            outputs["rgb"] = head

        if self.mode == "thermal":
            thermal_input = geo_feat  # view-independent (thermal_field.py:171)
            if not self.pass_thermal_gradients:
                thermal_input = jax.lax.stop_gradient(thermal_input)
            t_feat = self.mlp_thermal(thermal_input)
            outputs["thermal"] = self.thermal_head(t_feat).astype(jnp.float32)

        if self.use_transient_embedding and train:
            # NeRF-W style transient branch (thermal_field.py:140-158). The
            # reference's models never consume these outputs (nerfacto
            # ignores TRANSIENT_*); kept for field parity when enabled.
            et = self.embedding_transient(camera_indices)
            t_in = jnp.concatenate([geo_feat, et.astype(self.compute_dtype)], axis=-1)
            tx = self.mlp_transient(t_in)
            outputs["transient_rgb"] = nn.sigmoid(
                self.transient_rgb_head(tx)
            ).astype(jnp.float32)
            outputs["transient_density"] = jax.nn.softplus(
                self.transient_density_head(tx)
            ).astype(jnp.float32)

        if self.use_pred_normals:
            # nerfstudio PredNormalsFieldHead: MLP over (position enc NOT
            # replicated — geo features suffice on TPU; documented deviation)
            pn = self.mlp_pred_normals(geo_feat)
            outputs["pred_normals"] = normalize(
                self.pred_normals_head(pn).astype(jnp.float32)
            )
        return outputs

    def get_normals(self, positions: Array) -> Array:
        """Analytic surface normals: -normalize(grad_x density)
        (nerfstudio base_field.get_normals, used when predict_normals=True).
        ``positions``: [..., 3]; computed with a VJP through get_density."""

        def density_sum(p):
            d, _ = self.get_density(p, exact=True)
            return jnp.sum(d)

        grad = jax.grad(density_sum)(positions)
        return -normalize(grad)

    def __call__(
        self,
        positions: Array,
        directions: Array,
        camera_indices: Array,
        train: bool = True,
        compute_normals: bool = False,
    ) -> dict[str, Array]:
        """Full field forward: positions/directions [..., 3]. Eval
        (``train=False``) always uses exact trilinear encoding."""
        density, geo_feat = self.get_density(positions, exact=not train)
        outputs = self.get_head_outputs(geo_feat, directions, camera_indices, train)
        outputs["density"] = density
        if compute_normals:
            outputs["normals"] = self.get_normals(positions)
        return outputs


class CPDensityField(nn.Module):
    """Proposal-net density field over a CP-factorized (TensoRF-CP) grid,
    evaluated as two-hot MXU matmuls (ops/lowrank.py).

    TPU-native replacement for HashMLPDensityField in the proposal role
    (nerfstudio ``fields/density_fields.py``, bound at
    thermal_nerf_model.py:118-149): same contraction, selector, MLP -> 1
    density and trunc_exp semantics, but the encoding's forward AND backward
    are matmuls — no hash gathers, no scatter-add gradients. Proposal fields
    only steer hierarchical sampling (trained against the final field's
    histogram by the interlevel loss), where a rank-K density is an adequate
    guide; measured ~20x cheaper per sample than the hash path on v5e.
    """

    aabb: tuple
    resolution: int = 128
    rank: int = 32
    num_layers: int = 2
    hidden_dim: int = 16
    use_linear: bool = False
    use_contraction: bool = True
    average_init_density: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, positions: Array, exact: bool = False) -> Array:
        """positions [..., 3] world -> density [..., 1] f32. ``exact`` is
        accepted for HashMLPDensityField interface parity (CP evaluation is
        always exact trilinear)."""
        del exact
        if self.use_contraction:
            p = contract_to_unit_cube(positions)
        else:
            p = normalize_with_aabb(positions, jnp.asarray(self.aabb, jnp.float32))
        selector = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        p = p * selector[..., None]
        lines = self.param(
            "lines", lambda key: init_cp_lines(key, self.resolution, self.rank)
        )
        feats = cp_encode(lines, p).astype(self.compute_dtype)
        if self.use_linear:
            h = nn.Dense(1, dtype=self.compute_dtype)(feats)
        else:
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
            )(feats)
        density = self.average_init_density * trunc_exp(h.astype(jnp.float32))
        return density * selector[..., None].astype(jnp.float32)


class TriplaneDensityField(nn.Module):
    """Proposal-net density field over a K-planes/triplane grid, evaluated
    as per-plane MXU matmuls (ops/triplane.py).

    TPU-native NON-SEPARABLE replacement for HashMLPDensityField in the
    proposal role (nerfstudio ``fields/density_fields.py``, bound at
    thermal_nerf_model.py:118-149): same contraction, selector, MLP -> 1
    density and trunc_exp semantics, but the encoding is three bilinearly
    interpolated planes multiplied elementwise — forward AND backward are
    matmuls + dense VPU work (no hash gathers, no scatter-add gradients),
    while pairwise axis interactions stay representable (unlike the CP
    encoding, whose separable structure was the measured quality ceiling of
    the round-3 throughput preset — PERFORMANCE.md iso-wall-clock ablation).
    """

    aabb: tuple
    resolution: int = 128
    rank: int = 8
    num_layers: int = 2
    hidden_dim: int = 16
    use_linear: bool = False
    use_contraction: bool = True
    average_init_density: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, positions: Array, exact: bool = False) -> Array:
        """positions [..., 3] world -> density [..., 1] f32. ``exact`` is
        accepted for HashMLPDensityField interface parity (triplane
        evaluation is always exact bilinear)."""
        del exact
        if self.use_contraction:
            p = contract_to_unit_cube(positions)
        else:
            p = normalize_with_aabb(positions, jnp.asarray(self.aabb, jnp.float32))
        selector = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        p = p * selector[..., None]
        planes = self.param(
            "planes", lambda key: init_triplanes(key, self.resolution, self.rank)
        )
        feats = triplane_encode(planes, p).astype(self.compute_dtype)
        if self.use_linear:
            h = nn.Dense(1, dtype=self.compute_dtype)(feats)
        else:
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
            )(feats)
        density = self.average_init_density * trunc_exp(h.astype(jnp.float32))
        return density * selector[..., None].astype(jnp.float32)


class HashMLPDensityField(nn.Module):
    """Proposal-net density field (nerfstudio ``fields/density_fields.py``,
    bound at thermal_nerf_model.py:118-149). Coarse hash grid + tiny MLP -> 1
    density; nerfacto defaults: 5 levels, 2 feats, 2^17 table, MLP 2x16."""

    aabb: tuple
    num_levels: int = 5
    max_res: int = 128
    base_res: int = 16
    log2_hashmap_size: int = 17
    features_per_level: int = 2
    num_layers: int = 2
    hidden_dim: int = 16
    use_linear: bool = False
    use_contraction: bool = True
    average_init_density: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    hash_grad_corners: int = 0
    fwd_corners: int = 0  # stochastic-trilinear forward (0 = exact)

    @nn.compact
    def __call__(self, positions: Array, exact: bool = False) -> Array:
        """positions [..., 3] world -> density [..., 1] f32.

        ``exact=True`` disables the stochastic-trilinear estimators for this
        call (eval renders use exact trilinear; fwd_corners is a TRAINING
        throughput knob)."""
        if self.use_contraction:
            p = contract_to_unit_cube(positions)
        else:
            p = normalize_with_aabb(positions, jnp.asarray(self.aabb, jnp.float32))
        selector = jnp.all((p > 0.0) & (p < 1.0), axis=-1)
        p = p * selector[..., None]
        feats = HashEncoding(
            spec=HashGridSpec(
                num_levels=self.num_levels,
                features_per_level=self.features_per_level,
                log2_hashmap_size=self.log2_hashmap_size,
                base_res=self.base_res,
                max_res=self.max_res,
            ),
            grad_corners=0 if exact else self.hash_grad_corners,
            fwd_corners=0 if exact else self.fwd_corners,
        )(p)
        if self.use_linear:
            h = nn.Dense(1, dtype=self.compute_dtype)(feats.astype(self.compute_dtype))
        else:
            h = MLP(
                num_layers=self.num_layers,
                layer_width=self.hidden_dim,
                out_dim=1,
                compute_dtype=self.compute_dtype,
            )(feats)
        density = self.average_init_density * trunc_exp(h.astype(jnp.float32))
        return density * selector[..., None].astype(jnp.float32)
