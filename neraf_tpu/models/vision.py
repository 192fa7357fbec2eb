"""Nerfacto-class vision model: proposal-guided ray marching + volume rendering.

Functional rebuild of the nerfstudio NerfactoModel that the reference
subclasses (NeRAF_model.py:54-79), with the behaviors NeRAF pins down:
rgb clipped to [0,1] (NeRAF_model.py:67), average_init_density=0.01 and
SO3xR3 camera optimization (NeRAF_config.py:94-98).

Forward structure (all static shapes, one XLA computation per ray batch):
  1. uniform-lindisp bins (256) -> proposal net 0 -> weights -> PDF resample (96)
  2. -> proposal net 1 -> weights -> PDF resample (48)
  3. -> Nerfacto field -> density/rgb -> transmittance weights
  4. renderers: rgb (last_sample background), accumulation, depth
Losses: rgb MSE + interlevel (proposal supervision) + distortion.

Parameters are grouped to mirror the reference's optimizer groups
(NeRAF_config.py:115-132): {"proposal_networks", "fields", "camera_opt"}.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import VisionModelConfig
from neraf_tpu.fields.nerfacto import (
    NerfactoField,
    ProposalDensityField,
    ProposalFieldSpec,
)
from neraf_tpu.models.camera_opt import apply_camera_opt, init_camera_opt
from neraf_tpu.ops.render import (
    distortion_loss,
    interlevel_loss,
    render_accumulation,
    render_depth,
    render_rgb,
    render_weights,
)
from neraf_tpu.ops.samplers import (
    bins_to_samples,
    pdf_spacing_bins,
    uniform_spacing_bins,
)


@dataclasses.dataclass(frozen=True)
class VisionModel:
    """Static model definition; parameters live in external pytrees."""

    config: VisionModelConfig
    num_cameras: int = 1
    near: float = 0.05
    far: float = 1000.0
    compute_dtype: Any = jnp.float32  # bf16 under mixed precision
    fused_pe_mlp: bool = False  # Pallas fused PE+MLP (ops/pallas/fused_pe_mlp)

    @property
    def field(self) -> NerfactoField:
        return NerfactoField(config=self.config, num_cameras=self.num_cameras,
                             dtype=self.compute_dtype,
                             fused_mlp=self.fused_pe_mlp)

    def proposal(self, level: int) -> ProposalDensityField:
        max_res = 128 if level == 0 else 256
        prop_enc = getattr(self.config, "proposal_encoding", "fourier")
        return ProposalDensityField(
            spec=ProposalFieldSpec(encoding=prop_enc, max_res=max_res),
            average_init_density=self.config.average_init_density,
            dtype=self.compute_dtype,
            fused_mlp=self.fused_pe_mlp,
        )

    def init(self, key: jax.Array) -> dict:
        kf, k0, k1 = jax.random.split(key, 3)
        pos = jnp.zeros((1, 3))
        dirs = jnp.zeros((1, 3))
        cam = jnp.zeros((1,), jnp.int32)
        return {
            "fields": self.field.init(kf, pos, dirs, cam),
            "proposal_networks": {
                "level_0": self.proposal(0).init(k0, pos),
                "level_1": self.proposal(1).init(k1, pos),
            },
            "camera_opt": init_camera_opt(self.num_cameras),
        }

    # ------------------------------------------------------------------ forward
    def forward(
        self,
        params: dict,
        rays: dict,
        key: jax.Array,
        train: bool = True,
        anneal: float = 1.0,
        use_average_appearance: bool | None = None,
        apply_cam_opt: bool = True,
    ) -> dict:
        """Render a ray batch.

        rays: origins (R,3), directions (R,3), camera_indices (R,).
        Returns rgb/depth/accumulation plus per-level weights for losses.
        """
        cfg = self.config
        origins = rays["origins"]
        directions = rays["directions"]
        cam_idx = rays["camera_indices"]
        R = origins.shape[0]
        if use_average_appearance is None:
            use_average_appearance = not train

        if apply_cam_opt and train:
            origins, directions = apply_camera_opt(
                params["camera_opt"], cam_idx, origins, directions)

        near = jnp.full((R,), self.near)
        far = jnp.full((R,), self.far)

        k_init, k_pdf0, k_pdf1 = jax.random.split(key, 3)
        deterministic = not train

        num_p0, num_p1 = cfg.num_proposal_samples
        bins = uniform_spacing_bins(k_init, R, num_p0,
                                    single_jitter=cfg.use_single_jitter,
                                    deterministic=deterministic)

        weights_list = []
        spacing_list = []

        # proposal level 0
        s0 = bins_to_samples(bins, origins, directions, near, far)
        d0 = self.proposal(0).apply(params["proposal_networks"]["level_0"],
                                    s0["positions"])
        w0 = render_weights(d0, s0["deltas"])
        weights_list.append(w0)
        spacing_list.append((s0["spacing_starts"], s0["spacing_ends"]))
        # resampling is detached from the proposal weights (mip-NeRF-360
        # semantics: proposals learn only via the interlevel loss). This also
        # kills the inf gradient of w**anneal at w=0 (bf16 underflow).
        w0_s = jax.lax.stop_gradient(w0) ** anneal
        bins = pdf_spacing_bins(k_pdf0, bins, w0_s, num_p1,
                                single_jitter=cfg.use_single_jitter,
                                deterministic=deterministic)

        # proposal level 1
        s1 = bins_to_samples(bins, origins, directions, near, far)
        d1 = self.proposal(1).apply(params["proposal_networks"]["level_1"],
                                    s1["positions"])
        w1 = render_weights(d1, s1["deltas"])
        weights_list.append(w1)
        spacing_list.append((s1["spacing_starts"], s1["spacing_ends"]))
        w1_s = jax.lax.stop_gradient(w1) ** anneal
        bins = pdf_spacing_bins(k_pdf1, bins, w1_s, cfg.num_nerf_samples,
                                single_jitter=cfg.use_single_jitter,
                                deterministic=deterministic)

        # final field
        sf = bins_to_samples(bins, origins, directions, near, far)
        dirs_b = jnp.broadcast_to(directions[:, None, :], sf["positions"].shape)
        cam_b = jnp.broadcast_to(cam_idx[:, None], sf["positions"].shape[:-1])
        out = self.field.apply(params["fields"], sf["positions"], dirs_b, cam_b,
                               use_average_appearance=use_average_appearance)
        w = render_weights(out["density"], sf["deltas"])
        weights_list.append(w)
        spacing_list.append((sf["spacing_starts"], sf["spacing_ends"]))

        rgb = render_rgb(out["rgb"], w, background_color=cfg.background_color)
        rgb = jnp.clip(rgb, 0.0, 1.0)  # reference NeRAF_model.py:67
        return {
            "rgb": rgb,
            "accumulation": render_accumulation(w),
            "depth": render_depth(w, sf["mids"]),
            "expected_depth": render_depth(w, sf["mids"], method="expected"),
            "weights_list": weights_list,
            "spacing_list": spacing_list,
        }

    # ------------------------------------------------------------------- losses
    def loss(self, outputs: dict, gt_rgb: jnp.ndarray) -> dict:
        cfg = self.config
        losses = {"rgb_loss": jnp.mean((outputs["rgb"] - gt_rgb) ** 2)}

        w_final = outputs["weights_list"][-1]
        ss_final, se_final = outputs["spacing_list"][-1]
        inter = 0.0
        for lvl in range(len(outputs["weights_list"]) - 1):
            w_prop = outputs["weights_list"][lvl]
            ps, pe = outputs["spacing_list"][lvl]
            inter = inter + interlevel_loss(w_final, ss_final, se_final,
                                            w_prop, ps, pe)
        losses["interlevel_loss"] = cfg.interlevel_loss_mult * inter
        losses["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
            w_final, ss_final, se_final)
        return losses

    # ------------------------------------------------------------- grid queries
    def query_density_rgb(self, params: dict, positions: jnp.ndarray,
                          directions: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Point queries for the scene-grid bake: NO scene contraction
        (the bake temporarily disables it, reference NeRAF_model.py:302) and
        average appearance embedding.

        positions: (B, 3) world coords; directions: (B, 3).
        Returns (rgb (B,3) sigmoid, density (B,)).
        """
        cam = jnp.zeros(positions.shape[:-1], jnp.int32)
        out = self.field.apply(params["fields"], positions, directions, cam,
                               contract=False, use_average_appearance=True)
        return out["rgb"], out["density"]
