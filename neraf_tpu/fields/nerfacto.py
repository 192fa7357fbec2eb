"""Nerfacto-class radiance field + proposal density fields (flax).

TPU-native rebuild of nerfstudio's NerfactoField / HashMLPDensityField, the
field stack the reference inherits (SURVEY.md §2.2). Structure:

  positions --contract--> [0,1]^3 --hash encoding--> base MLP (2x64)
      -> (density_before_activation, geo_feat[15])
  density = average_init_density * trunc_exp(density_before_activation)
  rgb = sigmoid(head MLP(SH4(dir), geo_feat, appearance_embedding))

The hash encoding is the XLA gather path from ops/hashgrid.py; the small MLPs
are plain Dense stacks that XLA fuses into the surrounding computation (the
tcnn "fully-fused MLP" trick is the compiler's job on TPU — the MLP weights
stay resident in VMEM across the batch).
"""

from __future__ import annotations

import dataclasses
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import VisionModelConfig
from neraf_tpu.ops.contraction import contract_to_unit
from neraf_tpu.ops.encodings import sh_encoding
from neraf_tpu.ops.hashgrid import HashGridSpec, hash_encoding, init_hash_table


def _pe_mlp_block() -> int:
    return int(os.environ.get("NERAF_PE_MLP_BLOCK", "2048"))


def _pe_mlp_interpret() -> bool:
    # test hook: lets CPU suites drive the fused path in interpret mode
    return os.environ.get("NERAF_PE_MLP_INTERPRET", "") == "1"


class DenseParams(nn.Module):
    """Dense layer whose params are directly readable by fused kernels.

    Declares the exact {kernel, bias} param structure (and default inits)
    of nn.Dense so checkpoints are interchangeable; __call__ reproduces
    nn.Dense's compute (cast everything to `dtype`, matmul, bias add) for
    the XLA path, while the fused Pallas path reads .kernel/.bias
    directly (flax gives no way to read a sibling nn.Dense's params).
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x.astype(self.dtype) @ self.kernel.astype(self.dtype)
                + self.bias.astype(self.dtype))

    def wb(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(kernel, bias) for fused kernels (method call => flax binds+setups)."""
        return self.kernel, self.bias


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped-input gradient (instant-NGP trunc_exp)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class HashTable(nn.Module):
    """Hash-grid feature table as a flax parameter."""

    spec: HashGridSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = self.param("table", lambda k: init_hash_table(k, self.spec))
        return hash_encoding(table, x, self.spec)


class NerfactoField(nn.Module):
    """Main radiance field."""

    config: VisionModelConfig
    num_cameras: int = 1
    dtype: jnp.dtype = jnp.float32  # compute dtype for the MLPs
    fused_mlp: bool = False  # fourier base MLP via the Pallas fused kernel

    def setup(self):
        cfg = self.config
        if cfg.encoding == "hash":
            self.hash = HashTable(HashGridSpec(
                num_levels=cfg.num_levels,
                features_per_level=cfg.features_per_level,
                log2_hashmap_size=cfg.log2_hashmap_size,
                base_res=cfg.base_res,
                max_res=cfg.max_res,
                grad_mode=cfg.hash_grad_mode,
            ))
            base_layers = 2
            base_width = cfg.hidden_dim
            enc_dim = cfg.num_levels * cfg.features_per_level
        else:  # fourier: deeper/wider base MLP carries the capacity
            base_layers = cfg.base_mlp_layers
            base_width = cfg.base_mlp_width
            enc_dim = 6 * cfg.num_frequencies + 3
        in_dims = [enc_dim] + [base_width] * (base_layers - 1)
        self.mlp_base = [DenseParams(base_width, in_dims[i], name=f"base_{i}",
                                     dtype=self.dtype)
                         for i in range(base_layers)]
        self.base_out = DenseParams(1 + cfg.geo_feat_dim, base_width,
                                    name="base_out", dtype=self.dtype)
        self.mlp_head = [nn.Dense(cfg.hidden_dim_color, name=f"head_{i}", dtype=self.dtype)
                         for i in range(3)]
        self.head_out = nn.Dense(3, name="head_out", dtype=self.dtype)
        self.appearance = nn.Embed(self.num_cameras, cfg.appearance_embed_dim,
                                   name="appearance")

    def density_and_features(self, positions: jnp.ndarray, contract: bool = True):
        """positions (..., 3) world -> density (..., 1), geo features (..., G).

        contract=True: scene contraction -> [0,1]^3 (unbounded scenes).
        contract=False: normalize by the [-1,1] scene box and zero densities
        outside it — nerfstudio's no-distortion branch, used by the grid bake
        (reference NeRAF_model.py:302 disables contraction temporarily).
        """
        if contract:
            x = contract_to_unit(positions)
            selector = None
        else:
            x = (positions + 1.0) / 2.0  # scene box [-1, 1]^3
            selector = jnp.all((x > 0.0) & (x < 1.0), axis=-1)
        if self.config.encoding != "hash" and self.fused_mlp and contract:
            # fused Pallas PE+MLP: no [N, width] activation ever touches HBM.
            # Ray paths only (contract=True): running it on the grid-bake
            # path (contract=False) feeds the custom-call's fixed row-major
            # output layout into the carried grid state and cascades a
            # ~6 ms/step layout regression through the ResNet stem + pools
            # (joint select-and-scatter backwards reappear; profiled r5)
            from neraf_tpu.ops.pallas.fused_pe_mlp import pe_mlp

            params = [m.wb() for m in self.mlp_base]
            params.append(self.base_out.wb())
            flat = x.reshape(-1, 3)
            h = pe_mlp(flat, params,
                       self.config.num_frequencies, 0.0, 8.0, self.dtype,
                       _pe_mlp_block(), _pe_mlp_interpret())
            h = h.reshape(*x.shape[:-1], h.shape[-1]).astype(self.dtype)
        else:
            if self.config.encoding == "hash":
                h = self.hash(x)
            else:
                from neraf_tpu.ops.encodings import nerf_encoding

                h = nerf_encoding(x, num_frequencies=self.config.num_frequencies)
            for layer in self.mlp_base:
                h = nn.relu(layer(h))
            h = self.base_out(h)
        density_raw, geo = h[..., :1], h[..., 1:]
        density = self.config.average_init_density * trunc_exp(
            density_raw.astype(jnp.float32))
        if selector is not None:
            density = density * selector[..., None]
        return density, geo

    def rgb_from_features(self, directions: jnp.ndarray, geo: jnp.ndarray,
                          camera_indices: jnp.ndarray,
                          use_average_appearance: bool = False) -> jnp.ndarray:
        """directions (..., 3) unit vectors; camera_indices (...,) int."""
        d = (directions + 1.0) / 2.0
        d_enc = sh_encoding(d)
        if use_average_appearance:
            emb = jnp.mean(self.appearance.embedding, axis=0)
            emb = jnp.broadcast_to(emb, geo.shape[:-1] + (emb.shape[-1],))
        else:
            # one-hot matmul instead of nn.Embed's gather: the gather's
            # backward is a scatter-add into the tiny (num_cams, dim) table,
            # which XLA lowers serially (profiled 1.7 ms/step of a 53 ms
            # joint step on v5e for 4096x48 indices); as a matmul both
            # directions ride the MXU. Same param -> checkpoints unchanged.
            # Gated on table height: past ~4096 cameras the materialized
            # one-hot's HBM traffic (rows x num_cams x 2B) overtakes the
            # scatter cost, so huge capture rigs fall back to the gather.
            table = self.appearance.embedding
            if table.shape[0] <= 4096:
                oh = jax.nn.one_hot(camera_indices, table.shape[0],
                                    dtype=table.dtype)
                emb = jax.lax.dot_general(
                    oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(table.dtype)
            else:
                emb = self.appearance(camera_indices)
        h = jnp.concatenate([d_enc, geo, emb], axis=-1)
        for layer in self.mlp_head:
            h = nn.relu(layer(h))
        return nn.sigmoid(self.head_out(h))

    def __call__(self, positions, directions, camera_indices,
                 contract: bool = True, use_average_appearance: bool = False):
        density, geo = self.density_and_features(positions, contract)
        rgb = self.rgb_from_features(directions, geo, camera_indices,
                                     use_average_appearance)
        return {"density": density[..., 0], "rgb": rgb}


@dataclasses.dataclass(frozen=True)
class ProposalFieldSpec:
    encoding: str = "fourier"  # "fourier" | "hash"
    # fourier
    num_frequencies: int = 6
    mlp_width: int = 128
    mlp_layers: int = 2
    # hash
    num_levels: int = 5
    max_res: int = 128
    base_res: int = 16
    log2_hashmap_size: int = 17
    features_per_level: int = 2
    hidden_dim: int = 16


class ProposalDensityField(nn.Module):
    """Small density-only field for hierarchical sampling.

    'hash' mirrors nerfstudio's HashMLPDensityField; 'fourier' is the
    mip-NeRF-360-style PE+MLP proposal — the MXU-native default here (the
    proposal stages evaluate ~1.4M points per step, where gathers are the
    measured bottleneck on this backend).
    """

    spec: ProposalFieldSpec
    average_init_density: float = 0.01
    dtype: jnp.dtype = jnp.float32
    fused_mlp: bool = False  # fourier PE+MLP via the Pallas fused kernel

    @nn.compact
    def __call__(self, positions: jnp.ndarray, contract: bool = True) -> jnp.ndarray:
        x = contract_to_unit(positions) if contract else positions
        if self.spec.encoding != "hash" and self.fused_mlp:
            # explicit Dense_{i} names keep the param tree (and checkpoints)
            # identical to the nn.Dense auto-named XLA path below
            from neraf_tpu.ops.pallas.fused_pe_mlp import pe_mlp

            enc_dim = 6 * self.spec.num_frequencies + 3
            in_dims = [enc_dim] + [self.spec.mlp_width] * (self.spec.mlp_layers - 1)
            params = []
            for i in range(self.spec.mlp_layers):
                m = DenseParams(self.spec.mlp_width, in_dims[i],
                                name=f"Dense_{i}", dtype=self.dtype)
                params.append(m.wb())
            mo = DenseParams(1, self.spec.mlp_width,
                             name=f"Dense_{self.spec.mlp_layers}",
                             dtype=self.dtype)
            params.append(mo.wb())
            flat = x.reshape(-1, 3)
            h = pe_mlp(flat, params,
                       self.spec.num_frequencies, 0.0, 8.0, self.dtype,
                       _pe_mlp_block(), _pe_mlp_interpret())
            h = h.reshape(*x.shape[:-1], 1)
        elif self.spec.encoding == "hash":
            h = HashTable(HashGridSpec(
                num_levels=self.spec.num_levels,
                features_per_level=self.spec.features_per_level,
                log2_hashmap_size=self.spec.log2_hashmap_size,
                base_res=self.spec.base_res,
                max_res=self.spec.max_res,
                grad_mode=self.spec.hash_grad_mode,
            ))(x)
            h = nn.relu(nn.Dense(self.spec.hidden_dim, dtype=self.dtype)(h))
            h = nn.Dense(1, dtype=self.dtype)(h)
        else:
            from neraf_tpu.ops.encodings import nerf_encoding

            h = nerf_encoding(x, num_frequencies=self.spec.num_frequencies)
            for _ in range(self.spec.mlp_layers):
                h = nn.relu(nn.Dense(self.spec.mlp_width, dtype=self.dtype)(h))
            h = nn.Dense(1, dtype=self.dtype)(h)
        return self.average_init_density * trunc_exp(h[..., 0].astype(jnp.float32))
