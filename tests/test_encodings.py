"""Encodings: NeRF PE closed-form oracle, SH properties, hash-grid behavior."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.ops.encodings import nerf_encoding, nerf_encoding_dim, sh_encoding
from neraf_tpu.ops.hashgrid import HashGridSpec, hash_encoding, init_hash_table


def test_nerf_encoding_dims():
    x = jnp.zeros((5, 3))
    enc = nerf_encoding(x, num_frequencies=10)
    assert enc.shape == (5, nerf_encoding_dim(3, 10))
    assert enc.shape[-1] == 63
    t = jnp.zeros((5, 1))
    assert nerf_encoding(t).shape == (5, 21)


def test_nerf_encoding_values(rng):
    """Oracle: the nerfstudio formula computed directly in numpy."""
    x = rng.random((7, 3)).astype(np.float32)
    freqs = 2.0 ** np.linspace(0.0, 8.0, 10)
    scaled = 2 * np.pi * x
    ang = (scaled[..., None] * freqs).reshape(7, -1)
    expected = np.concatenate([np.sin(ang), np.sin(ang + np.pi / 2), x], axis=-1)
    ours = np.asarray(nerf_encoding(jnp.asarray(x)))
    # 2^8 * 2pi * x reaches ~1600 rad; float32 argument reduction costs ~2e-4
    np.testing.assert_allclose(ours, expected, atol=1e-3)


def test_sh_encoding_structure():
    # input 0.5 -> remapped to the zero vector: all odd-degree terms vanish;
    # coefficient 6 keeps its constant part (tcnn evaluates the raw polynomial)
    out = np.asarray(sh_encoding(jnp.asarray([[0.5, 0.5, 0.5]])))
    np.testing.assert_allclose(out[0, 0], 0.28209479177387814, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1:6], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 6], -0.31539156525251999, rtol=1e-6)
    np.testing.assert_allclose(out[0, 7:9], 0.0, atol=1e-6)
    # degree-1 terms are linear in the remapped input
    out_x = np.asarray(sh_encoding(jnp.asarray([[1.0, 0.5, 0.5]])))  # x=+1
    np.testing.assert_allclose(out_x[0, 3], -0.48860251190291987, rtol=1e-6)
    out_z = np.asarray(sh_encoding(jnp.asarray([[0.5, 0.5, 1.0]])))  # z=+1
    np.testing.assert_allclose(out_z[0, 2], 0.48860251190291987, rtol=1e-6)
    assert out.shape == (1, 16)


def test_hash_encoding_shapes_and_grad():
    spec = HashGridSpec(num_levels=4, features_per_level=2, log2_hashmap_size=8,
                        base_res=4, max_res=32)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (11, 3))
    out = hash_encoding(table, x, spec)
    assert out.shape == (11, spec.out_dim)

    def loss(tbl):
        return jnp.sum(hash_encoding(tbl, x, spec) ** 2)

    g = jax.grad(loss)(table)
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_hash_encoding_is_continuous():
    """Trilinear interp: small input perturbations give small output changes."""
    spec = HashGridSpec(num_levels=2, features_per_level=2, log2_hashmap_size=10,
                        base_res=4, max_res=8)
    table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e4  # amplify
    x = jnp.asarray([[0.37, 0.52, 0.61]])
    eps = 1e-5
    a = hash_encoding(table, x, spec)
    b = hash_encoding(table, x + eps, spec)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_hash_encoding_dense_levels_exact():
    """On a dense (collision-free) level, a query at a cell corner returns the
    table entry for that corner exactly."""
    spec = HashGridSpec(num_levels=1, features_per_level=2, log2_hashmap_size=10,
                        base_res=4, max_res=4)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    # corner (1, 2, 3) on a res-4 grid -> position (0.25, 0.5, 0.75)
    x = jnp.asarray([[0.25, 0.5, 0.75]])
    out = np.asarray(hash_encoding(table, x, spec))[0]
    idx = 1 + 2 * 5 + 3 * 25
    np.testing.assert_allclose(out, np.asarray(table)[0, idx], atol=1e-6)


def test_hash_encoding_batch_shape():
    spec = HashGridSpec(num_levels=2, features_per_level=2, log2_hashmap_size=8,
                        base_res=4, max_res=8)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 5, 3))
    assert hash_encoding(table, x, spec).shape == (3, 5, spec.out_dim)


def test_gather_rows_vjp_strategies_match_autodiff(rng):
    """The scatter-free table gradients (scatter_set / gather) must equal the
    XLA autodiff scatter-add gradient bit-for-bit-ish. These exist because
    the axon TPU backend's scatter-add crashes the worker during hash-grid
    TRAINING (docs/HASH_PERF.md:67-92); tcnn-parity training rides on them."""
    import jax
    import jax.numpy as jnp

    from neraf_tpu.ops.hashgrid import gather_rows

    n_rows, M, F = 64, 512, 4
    table = jnp.asarray(rng.standard_normal((n_rows, F)), jnp.float32)
    # heavy duplication + untouched rows + touched row 0 and n_rows-1
    idx = jnp.asarray(
        np.concatenate([rng.integers(0, 40, M - 2), [0, n_rows - 1]]),
        jnp.int32)
    ct = jnp.asarray(rng.standard_normal((M, F)), jnp.float32)

    def loss(tbl, mode):
        return jnp.sum(gather_rows(tbl, idx, n_rows, mode) * ct)

    ref = jax.grad(lambda tbl: jnp.sum(tbl[idx] * ct))(table)
    for mode in ("scatter", "scatter_set", "gather"):
        g = jax.grad(loss)(table, mode)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=mode)
        # under jit too (trace-time strategy dispatch)
        gj = jax.jit(jax.grad(loss), static_argnums=1)(table, mode)
        np.testing.assert_allclose(np.asarray(gj), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"jit:{mode}")


def test_gather_rows_chunked_backward_matches_flat(rng):
    """bwd_chunk caps the sort length: the backward scans sort-sized chunks
    and accumulates dense partial gradients (the compile-tractable form for
    the 12.6M-row training load). Must equal the flat single-sort form and
    autodiff — including a non-divisible M (sentinel-padded final chunk)
    and rows split across chunk boundaries."""
    import jax
    import jax.numpy as jnp

    from neraf_tpu.ops.hashgrid import gather_rows

    n_rows, M, F, chunk = 64, 1000, 2, 256  # 1000 = 3 full chunks + 232 pad
    idx = jnp.asarray(rng.integers(0, n_rows, M), jnp.int32)
    table = jnp.asarray(rng.standard_normal((n_rows, F)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((M, F)), jnp.float32)

    ref = jax.grad(lambda tbl: jnp.sum(tbl[idx] * ct))(table)
    for mode in ("scatter_set", "gather"):
        flat = jax.grad(lambda tbl: jnp.sum(
            gather_rows(tbl, idx, n_rows, mode) * ct))(table)
        chunked = jax.grad(lambda tbl: jnp.sum(
            gather_rows(tbl, idx, n_rows, mode, chunk) * ct))(table)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=mode)
        # vs the flat form: same totals, different fp32 accumulation order
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(flat),
                                   rtol=1e-5, atol=1e-5, err_msg=mode)


def test_hash_encoding_grads_identical_across_grad_modes(rng):
    """Full encoding: table AND position gradients must be identical whatever
    backward strategy the table gather uses (positions differentiate through
    the trilinear weights, outside the custom VJP)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    spec0 = HashGridSpec(num_levels=3, features_per_level=2,
                         log2_hashmap_size=7, base_res=4, max_res=32,
                         grad_mode="scatter")
    table = init_hash_table(jax.random.PRNGKey(1), spec0)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (128, 3)), jnp.float32)

    def loss(tbl, pos, spec):
        return jnp.sum(jnp.sin(hash_encoding(tbl, pos, spec) * 3.0))

    ref_gt, ref_gx = jax.grad(loss, argnums=(0, 1))(table, x, spec0)
    # tolerance: fp32 reassociation — the sorted cumsum accumulates long
    # duplicate runs (coarse levels) in a different order than scatter-add
    for mode in ("scatter_set", "gather"):
        spec = dc.replace(spec0, grad_mode=mode)
        gt, gx = jax.grad(loss, argnums=(0, 1))(table, x, spec)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(ref_gt),
                                   rtol=5e-3, atol=5e-4, err_msg=f"table:{mode}")
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx),
                                   rtol=5e-3, atol=5e-4, err_msg=f"pos:{mode}")


def test_hash_fault_isolate_cases_smoke(monkeypatch):
    """All isolation-canary cases run at tiny CPU sizes (import/shape
    bitrot guard for scripts/hash_fault_isolate.py; full-size runs are
    TPU-only diagnostics)."""
    import importlib
    import sys as _sys
    from pathlib import Path

    monkeypatch.setenv("ISOLATE_M_ROWS", "4096")
    monkeypatch.setenv("ISOLATE_CHUNK", "512")
    monkeypatch.setenv("ISOLATE_N_ROWS", "1024")
    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import hash_fault_isolate as hfi
        hfi = importlib.reload(hfi)  # re-read env-sized constants
        for case in hfi.CASES:
            hfi.run_child(case, iters=2)
    finally:
        _sys.path.pop(0)
