"""Pre-folded grid state: fold/unfold algebra, slab-splice bake equivalence,
joint-step equivalence vs the legacy fold-per-step path, and checkpoint
compatibility (derived field stripped on save, refolded on restore,
old 7-field checkpoints restorable).

Reference semantics under test: the detach-then-write-live grid bake of
NeRAF_model.py:395-400 — the folded path must preserve both the values and
the gradient-through-fresh-cells coupling while changing only the layout
the ResNet stem consumes (models/resnet3d.py::_StemConv s2d fold).
"""

import collections

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.models.grid import (
    bake_cells,
    bake_cells_folded,
    cell_centers,
    fold_grid,
    fold_volume,
    folded_bake_supported,
    grid_to_volume,
    init_grid,
    unfold_volume,
)

from test_joint_pipeline import _make_pipeline


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 7),
                    jnp.float32)
    f = fold_volume(x)
    assert f.shape == (1, 4, 4, 4, 56)
    np.testing.assert_array_equal(np.asarray(unfold_volume(f)), np.asarray(x))


def test_fold_matches_stem_fold_order():
    """fold_volume must be THE fold _StemConv applies (channel order
    (fd, fh, fw, c)) — pin it against the explicit index map."""
    x = np.random.RandomState(1).randn(1, 4, 4, 4, 3).astype(np.float32)
    f = np.asarray(fold_volume(jnp.asarray(x)))
    for d2 in range(2):
        for h2 in range(2):
            for w2 in range(2):
                for fd in range(2):
                    for fh in range(2):
                        for fw in range(2):
                            for c in range(3):
                                c8 = ((fd * 2 + fh) * 2 + fw) * 3 + c
                                assert f[0, d2, h2, w2, c8] == x[
                                    0, 2 * d2 + fd, 2 * h2 + fh,
                                    2 * w2 + fw, c]


def test_folded_bake_supported_gating():
    assert folded_bake_supported(128, 4096)  # production
    assert folded_bake_supported(8, 16)
    assert folded_bake_supported(16, 64)
    assert not folded_bake_supported(8, 128)  # crosses x-planes
    assert not folded_bake_supported(8, 8)  # odd y-row count
    assert not folded_bake_supported(7, 14)  # odd res


def test_bake_cells_folded_equals_fold_of_flat_bake():
    r = 8
    bake = 16
    rng = np.random.RandomState(2)
    grid = jnp.asarray(np.concatenate(
        [rng.randn(r ** 3, 4), cell_centers(r)], axis=1), jnp.float32)
    folded = fold_grid(grid, r)
    cells = jnp.asarray(cell_centers(r))
    cursor = 0
    # a full refresh cycle incl. the wrap
    for _ in range(r ** 3 // bake + 3):
        fresh = jnp.asarray(rng.randn(bake, 4), jnp.float32)
        grid, new_cursor = bake_cells(grid, jnp.int32(cursor), fresh)
        folded = bake_cells_folded(folded, jnp.int32(cursor), fresh, cells, r)
        np.testing.assert_array_equal(
            np.asarray(folded),
            np.asarray(fold_volume(grid_to_volume(grid, r))))
        cursor = int(new_cursor)
    assert cursor == (3 * bake) % (r ** 3)


def test_bake_cells_folded_gradient_through_fresh():
    """stop_gradient(base) + live fresh splice: gradient lands only on fresh."""
    r = 8
    grid = init_grid(r)
    folded = fold_grid(grid, r)
    cells = jnp.asarray(cell_centers(r))

    def f(theta):
        fresh = jnp.ones((16, 4)) * theta
        out = bake_cells_folded(folded, jnp.int32(16), fresh, cells, r)
        return jnp.sum(out.astype(jnp.float32))

    g = float(jax.grad(f)(jnp.float32(1.0)))
    np.testing.assert_allclose(g, 16 * 4, rtol=1e-6)


def test_joint_step_folded_matches_legacy(tmp_path):
    """The folded-state train step must reproduce the legacy fold-per-step
    step: same losses, same params, same flat grid, and folded == fold(flat).
    """
    from neraf_tpu.data.vision_data import camera_arrays

    pipe_f, vds, ads, _ = _make_pipeline(tmp_path, grid_res=8, bake_cells=16)
    assert pipe_f._folded_bake
    pipe_l, _, _, _ = _make_pipeline(tmp_path, grid_res=8, bake_cells=16)
    pipe_l._folded_bake = False  # before first trace: legacy path compiles

    cam_arrays = camera_arrays(vds.cameras)
    image_arrays = {"images": jnp.asarray(vds.images)}
    audio_arrays = ads.slice_arrays()

    sf = pipe_f.init_state(seed=0)
    sl = pipe_l.init_state(seed=0)
    assert sf.grid_folded is not None
    for _ in range(5):
        sf, mf = pipe_f.train_step(sf, cam_arrays, audio_arrays, image_arrays)
        sl, ml = pipe_l.train_step(sl, cam_arrays, audio_arrays, image_arrays)

    for k in mf:
        np.testing.assert_allclose(float(mf[k]), float(ml[k]), rtol=2e-4,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(sf.grid), np.asarray(sl.grid),
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                    jax.tree_util.tree_leaves(sl.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the derived invariant: folded state IS the fold of the flat grid
    np.testing.assert_array_equal(
        np.asarray(sf.grid_folded),
        np.asarray(fold_grid(sf.grid, 8, pipe_f._folded_dtype)))


def test_checkpoint_strips_and_refolds(tmp_path):
    from neraf_tpu.data.vision_data import camera_arrays
    from neraf_tpu.engine.checkpoints import (
        restore_checkpoint,
        save_checkpoint,
    )

    pipe, vds, ads, _ = _make_pipeline(tmp_path, grid_res=8, bake_cells=16)
    state = pipe.init_state(seed=0)
    cam_arrays = camera_arrays(vds.cameras)
    image_arrays = {"images": jnp.asarray(vds.images)}
    audio_arrays = ads.slice_arrays()
    for _ in range(3):
        state, _ = pipe.train_step(state, cam_arrays, audio_arrays,
                                   image_arrays)

    path = save_checkpoint(tmp_path / "ck", int(state.step), state)
    # the derived field is NOT serialized
    import orbax.checkpoint as ocp

    meta = ocp.StandardCheckpointer().metadata(path)
    assert "grid_folded" not in meta.item_metadata.tree

    restored = restore_checkpoint(path, pipe.init_state(seed=0))
    np.testing.assert_array_equal(np.asarray(restored.grid),
                                  np.asarray(state.grid))
    np.testing.assert_array_equal(np.asarray(restored.grid_folded),
                                  np.asarray(state.grid_folded))


def test_restore_legacy_seven_field_checkpoint(tmp_path):
    """Checkpoints written before grid_folded existed (a 7-field state)
    restore into the new state shape with the folded copy derived."""
    import orbax.checkpoint as ocp
    from neraf_tpu.engine.checkpoints import restore_checkpoint

    pipe, _, _, _ = _make_pipeline(tmp_path, grid_res=8, bake_cells=16)
    state = pipe.init_state(seed=0)

    Legacy = collections.namedtuple(
        "JointTrainState",
        ["params", "batch_stats", "opt_states", "grid", "cursor", "step",
         "rng"])
    legacy = Legacy(params=state.params, batch_stats=state.batch_stats,
                    opt_states=state.opt_states, grid=state.grid,
                    cursor=state.cursor, step=state.step, rng=state.rng)
    ck = ocp.StandardCheckpointer()
    path = tmp_path / "legacy" / "step-000000001"
    ck.save(path, legacy, force=True)
    ck.wait_until_finished()

    restored = restore_checkpoint(path, pipe.init_state(seed=0))
    np.testing.assert_array_equal(np.asarray(restored.grid),
                                  np.asarray(state.grid))
    np.testing.assert_array_equal(np.asarray(restored.grid_folded),
                                  np.asarray(state.grid_folded))


def test_stem_conv_baked_matches_autodiff():
    """ops/baked_stem.py: the slab-local input VJP must equal autodiff
    through conv(DUS(stop_grad(base), slab)) — values, d_slab and d_w —
    including slabs at every boundary (first/last depth plane, first/last
    row block, both channel offsets)."""
    from neraf_tpu.ops.baked_stem import stem_conv_baked

    r = 8  # folded volume (1, 4, 4, 4, 56); bake=16 -> slab (1,1,1,4,28)
    bake = 16
    rng = np.random.RandomState(3)
    base = jnp.asarray(rng.randn(1, r // 2, r // 2, r // 2,
                                 8 * 7), jnp.float32)
    wp = jnp.asarray(rng.randn(3, 3, 3, 56, 5) * 0.1, jnp.float32)
    cells = jnp.asarray(cell_centers(r))
    probe = jnp.asarray(rng.randn(1, r // 2, r // 2, r // 2, 5), jnp.float32)

    def ref_loss(fresh, w, cursor):
        nf = bake_cells_folded(base, cursor, fresh, cells, r)
        out = jax.lax.conv_general_dilated(
            nf, w, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(out * probe)

    from neraf_tpu.models.grid import folded_slab

    def new_loss(fresh, w, cursor):
        slab, d0, h0, ch = folded_slab(fresh, cursor, cells, r, base.dtype)
        nf = jax.lax.dynamic_update_slice(
            base, jax.lax.stop_gradient(slab),
            (jnp.int32(0), d0, h0, jnp.int32(0), ch))
        out = stem_conv_baked(nf, slab, d0, h0, ch, w)
        return jnp.sum(out * probe)

    # every cursor position of the full refresh cycle (r^3/bake = 32 slabs
    # covering all depth planes, row blocks and both channel offsets)
    for cursor in range(0, r ** 3, bake):
        fresh = jnp.asarray(rng.randn(bake, 4), jnp.float32)
        c = jnp.int32(cursor)
        v_ref = float(ref_loss(fresh, wp, c))
        v_new = float(new_loss(fresh, wp, c))
        np.testing.assert_allclose(v_new, v_ref, rtol=1e-5, err_msg=str(cursor))
        g_ref = jax.grad(ref_loss, argnums=(0, 1))(fresh, wp, c)
        g_new = jax.grad(new_loss, argnums=(0, 1))(fresh, wp, c)
        np.testing.assert_allclose(np.asarray(g_new[0]), np.asarray(g_ref[0]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d_fresh cursor={cursor}")
        np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d_w cursor={cursor}")
