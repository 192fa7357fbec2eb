"""Fused PE+MLP Pallas kernel (ops/pallas/fused_pe_mlp.py).

Interpret-mode parity (fwd + custom-VJP grads) against the plain
nerf_encoding + Dense-chain math, field-level integration parity for both
the proposal and main fields, param-tree/checkpoint compatibility between
the fused and XLA paths, and the dispatch contract (non-TPU backends and
meshed runs fall back to XLA).

Reference role: this kernel is the TPU-native replacement for tinycudann's
fully-fused MLPs (SURVEY §2.3; NeRAF_model.py:164-167 via Nerfacto's field
stack) on the vision ray path — the largest time bucket of the joint train
step (docs/STEP_PROFILE.md round 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import VisionModelConfig
from neraf_tpu.fields.nerfacto import NerfactoField, ProposalDensityField, ProposalFieldSpec
from neraf_tpu.ops.encodings import nerf_encoding
from neraf_tpu.ops.pallas.fused_pe_mlp import (
    pe_mlp,
    pe_mlp_available,
    resolve_pe_mlp_fused,
)


def _ref_mlp(x, params, num_frequencies):
    h = nerf_encoding(x, num_frequencies=num_frequencies)
    for (w, b) in params[:-1]:
        h = jax.nn.relu(h @ w + b)
    (w, b) = params[-1]
    return h @ w + b


def _rand_params(rng, num_frequencies, hidden, layers, out_dim):
    din = 6 * num_frequencies + 3
    dims = [din] + [hidden] * layers + [out_dim]
    return [(jnp.asarray(rng.randn(dims[i], dims[i + 1]) * dims[i] ** -0.5,
                         jnp.float32),
             jnp.asarray(rng.randn(dims[i + 1]) * 0.01, jnp.float32))
            for i in range(len(dims) - 1)]


@pytest.mark.parametrize("F,H,L,O", [(6, 32, 2, 1), (4, 24, 4, 8)])
def test_pe_mlp_interpret_parity(F, H, L, O):
    rng = np.random.RandomState(0)
    n = 300  # deliberately NOT a multiple of block: exercises padding
    x = jnp.asarray(rng.rand(n, 3), jnp.float32)
    params = _rand_params(rng, F, H, L, O)

    out = pe_mlp(x, params, F, 0.0, 8.0, jnp.float32, 256, True)
    ref = _ref_mlp(x, params, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # Gradient parity. A pre-activation within f32 noise of 0 flips its
    # relu subgradient between the two float orderings (both are valid
    # subgradients), swinging whole dx elements / dW columns. Rows are
    # independent, so drop rows with ANY near-boundary unit (numpy replica
    # of the forward) and demand tight parity on the rest.
    freqs = (2.0 ** np.linspace(0, 8, F)).astype(np.float32)
    xn = np.asarray(x)
    ang = ((2 * np.pi * xn)[..., None] * freqs).reshape(xn.shape[0], -1)
    h = np.concatenate([np.sin(ang), np.sin(ang + np.pi / 2), xn], -1)
    keep = np.ones(xn.shape[0], bool)
    for (w, b) in params[:-1]:
        pre = h @ np.asarray(w) + np.asarray(b)
        keep &= (np.abs(pre) > 1e-4 * np.abs(pre).max()).all(axis=-1)
        h = np.maximum(pre, 0.0)
    assert keep.sum() >= n // 2  # the filter must not eat the test
    xg = x[np.where(keep)[0]]

    def loss_k(x, p):
        return jnp.sum(jnp.tanh(pe_mlp(x, p, F, 0.0, 8.0, jnp.float32,
                                       256, True)))

    def loss_r(x, p):
        return jnp.sum(jnp.tanh(_ref_mlp(x, p, F)))

    gk = jax.grad(loss_k, argnums=(0, 1))(xg, params)
    gr = jax.grad(loss_r, argnums=(0, 1))(xg, params)
    dx_scale = float(jnp.max(jnp.abs(gr[0])))
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=2e-3, atol=1e-4 * dx_scale)
    for (dwk, dbk), (dwr, dbr) in zip(gk[1], gr[1]):
        for a, b in ((np.asarray(dwk), np.asarray(dwr)),
                     (np.asarray(dbk), np.asarray(dbr))):
            np.testing.assert_allclose(
                a, b, rtol=2e-3, atol=1e-4 * max(np.abs(b).max(), 1e-3))


def _proposal_pair(F=3, width=16, layers=2):
    spec = ProposalFieldSpec(encoding="fourier", num_frequencies=F,
                             mlp_width=width, mlp_layers=layers)
    fused = ProposalDensityField(spec=spec, fused_mlp=True)
    plain = ProposalDensityField(spec=spec, fused_mlp=False)
    return fused, plain


def test_proposal_field_fused_matches_xla(monkeypatch):
    monkeypatch.setenv("NERAF_PE_MLP_INTERPRET", "1")
    monkeypatch.setenv("NERAF_PE_MLP_BLOCK", "128")
    fused, plain = _proposal_pair()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 11, 3), jnp.float32)
    p = plain.init(jax.random.PRNGKey(0), x)
    # identical param trees: fused checkpoints ARE xla checkpoints
    pf = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(pf)))

    d_plain = plain.apply(p, x)
    d_fused = fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_plain),
                               rtol=2e-4, atol=1e-6)

    g_plain = jax.grad(lambda p: jnp.sum(plain.apply(p, x)))(p)
    g_fused = jax.grad(lambda p: jnp.sum(fused.apply(p, x)))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_nerfacto_field_fused_matches_xla(monkeypatch):
    monkeypatch.setenv("NERAF_PE_MLP_INTERPRET", "1")
    monkeypatch.setenv("NERAF_PE_MLP_BLOCK", "128")
    cfg = VisionModelConfig(num_frequencies=4, base_mlp_width=24,
                            base_mlp_layers=2, geo_feat_dim=7,
                            hidden_dim_color=16, appearance_embed_dim=4)
    fused = NerfactoField(config=cfg, num_cameras=3, fused_mlp=True)
    plain = NerfactoField(config=cfg, num_cameras=3, fused_mlp=False)
    rng = np.random.RandomState(2)
    pos = jnp.asarray(rng.randn(50, 3) * 0.5, jnp.float32)
    dirs = jnp.asarray(rng.randn(50, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = jnp.zeros((50,), jnp.int32)

    p = plain.init(jax.random.PRNGKey(0), pos, dirs, cam)
    assert (jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), pos, dirs, cam)))

    o_plain = plain.apply(p, pos, dirs, cam)
    o_fused = fused.apply(p, pos, dirs, cam)
    np.testing.assert_allclose(np.asarray(o_fused["density"]),
                               np.asarray(o_plain["density"]),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o_fused["rgb"]),
                               np.asarray(o_plain["rgb"]),
                               rtol=2e-4, atol=1e-6)

    # the bake path (contract=False + selector zeroing) must agree too
    b_plain = plain.apply(p, pos, dirs, cam, contract=False,
                          use_average_appearance=True)
    b_fused = fused.apply(p, pos, dirs, cam, contract=False,
                          use_average_appearance=True)
    np.testing.assert_allclose(np.asarray(b_fused["density"]),
                               np.asarray(b_plain["density"]),
                               rtol=2e-4, atol=1e-6)


def test_dispatch_contract(monkeypatch):
    cfg = VisionModelConfig()
    # CPU backend: auto never selects fused (AOT probe is TPU-only)
    assert resolve_pe_mlp_fused(cfg, mesh=None) is False
    assert pe_mlp_available(2, 128, 1, 6, 2048, "bfloat16") is False
    # env forces win over everything
    monkeypatch.setenv("NERAF_PE_MLP", "xla")
    assert resolve_pe_mlp_fused(cfg, mesh=None) is False
    monkeypatch.setenv("NERAF_PE_MLP", "fused")
    assert resolve_pe_mlp_fused(cfg, mesh=None) is True
    monkeypatch.delenv("NERAF_PE_MLP")
    # meshed runs stay on XLA (pallas_call is opaque to GSPMD)
    class _FakeMesh:
        axis_names = ("data",)
    assert resolve_pe_mlp_fused(cfg, mesh=_FakeMesh()) is False
