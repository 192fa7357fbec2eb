"""Scene-grid bridge: progressive bake of the radiance field into a feature grid.

Rebuild of the reference's query_grid_one_batch machinery
(NeRAF_model.py:178-407): a (D,H,W,7) grid — channels 0:3 rgb, 3 alpha,
4:7 cell xyz — refreshed cursor-wise with `cells_per_step` cells per training
step (full refresh every D*H*W/cells_per_step steps). Each refreshed cell is
the mean of the radiance field queried along 18 fixed viewing directions
(3 elevations x 6 azimuths; the x and y components are both
cos(phi)sin(theta) — a faithful quirk of the reference, :279-292), with
alpha = clip(1 - exp(-1e-2 * density), 0, 1).

Gradient semantics (the core trick, reference :395-400): the carried grid is
treated as a constant (stop_gradient) and the freshly computed cells are
spliced in *live*, so the audio loss backpropagates into the radiance field
through exactly this step's cells. Here that is explicit:
`stop_gradient(grid)` + `dynamic_update_slice(fresh)` inside the jitted step.

Layout is channels-last (cells-flat, 7) so the splice is one contiguous
dynamic_update_slice and the ResNet sees NDHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

GRID_CHANNELS = 7
_DELTA = 1e-2  # reference NeRAF_model.py:191


def single_viewing_direction() -> jnp.ndarray:
    """use_multiple_viewing_directions=False: one +x query direction
    (reference NeRAF_model.py:359-370)."""
    return jnp.asarray([[1.0, 0.0, 0.0]], dtype=jnp.float32)


def fixed_viewing_directions() -> jnp.ndarray:
    """The 18 reference view dirs (x==y quirk preserved, NeRAF_model.py:279-292)."""
    phis = [math.pi / 3, 0.0, -math.pi]
    thetas = [k * math.pi / 3 for k in range(6)]
    dirs = []
    for phi in phis:
        for theta in thetas:
            dirs.append([
                math.cos(phi) * math.sin(theta),
                math.cos(phi) * math.sin(theta),
                math.sin(theta),
            ])
    return jnp.asarray(dirs, dtype=jnp.float32)


def cell_centers(grid_res: int) -> np.ndarray:
    """Unit-cube cell centers, flattened C-order over (x, y, z) -> (N, 3)."""
    step = 1.0 / grid_res
    axis = np.arange(step / 2, 1.0, step)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


def init_grid(grid_res: int) -> jnp.ndarray:
    """Zeroed (N_cells, 7) grid with channels 4:7 = cell coordinates."""
    cells = cell_centers(grid_res)
    grid = np.zeros((cells.shape[0], GRID_CHANNELS), dtype=np.float32)
    grid[:, 4:] = cells
    return jnp.asarray(grid)


def grid_to_volume(grid_flat: jnp.ndarray, grid_res: int) -> jnp.ndarray:
    """(N_cells, 7) -> (1, D, H, W, 7) NDHWC volume for the ResNet."""
    return grid_flat.reshape(1, grid_res, grid_res, grid_res, GRID_CHANNELS)


def compute_fresh_cells(
    query_fn,
    cursor: jnp.ndarray,
    cells: jnp.ndarray,
    aabb: jnp.ndarray,
    cells_per_step: int,
    view_dirs: jnp.ndarray,
) -> jnp.ndarray:
    """Query the radiance field for one cursor batch of cells.

    Args:
        query_fn: (positions (B,3), directions (B,3)) -> (rgb (B,3), density (B,)),
            differentiable w.r.t. the field params closed over by the caller.
        cursor: scalar int32 flat-cell offset (multiple of cells_per_step).
        cells: (N_cells, 3) unit-cube centers.
        aabb: (2, 3) vision scene box (world = cells * extent + aabb[0]).
    Returns:
        (cells_per_step, 4) fresh rgb+alpha values.
    """
    batch_cells = jax.lax.dynamic_slice(
        cells, (cursor, 0), (cells_per_step, 3))
    world = batch_cells * (aabb[1] - aabb[0]) + aabb[0]

    n_dirs = view_dirs.shape[0]
    pos = jnp.broadcast_to(world[None, :, :], (n_dirs, cells_per_step, 3))
    dirs = jnp.broadcast_to(view_dirs[:, None, :], (n_dirs, cells_per_step, 3))
    rgb, density = query_fn(pos.reshape(-1, 3), dirs.reshape(-1, 3))
    rgb = jnp.mean(rgb.reshape(n_dirs, cells_per_step, 3), axis=0)
    density = jnp.mean(density.reshape(n_dirs, cells_per_step), axis=0)

    alpha = jnp.clip(1.0 - jnp.exp(-_DELTA * density), 0.0, 1.0)
    return jnp.concatenate([rgb, alpha[:, None]], axis=-1)


def fold_volume(vol: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Space-to-depth fold: (N, D, H, W, C) -> (N, D/2, H/2, W/2, 8C).

    Channel order of the folded axis is (fd, fh, fw, c) — each output
    channel 8*c block holds one 2^3 sub-position. This is THE fold the
    ResNet stem consumes (models/resnet3d.py::_StemConv): keeping the grid
    state pre-folded removes a ~6 ms/step relayout+convert chain from the
    joint step (docs/STEP_PROFILE.md round-5 section).
    """
    n, d, h, w, c = vol.shape
    x = vol if dtype is None else vol.astype(dtype)
    x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def unfold_volume(folded: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fold_volume: (N, D2, H2, W2, 8C) -> (N, 2*D2, 2*H2, 2*W2, C)."""
    n, d2, h2, w2, c8 = folded.shape
    c = c8 // 8
    x = folded.reshape(n, d2, h2, w2, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(n, 2 * d2, 2 * h2, 2 * w2, c)


def fold_grid(grid_flat: jnp.ndarray, grid_res: int, dtype=None) -> jnp.ndarray:
    """(N_cells, 7) flat grid -> pre-folded (1, R/2, R/2, R/2, 56) volume."""
    return fold_volume(grid_to_volume(grid_flat, grid_res), dtype=dtype)


def folded_bake_supported(grid_res: int, cells_per_step: int) -> bool:
    """True when one cursor batch maps to ONE contiguous slab of the folded
    volume: the batch must cover whole z-rows in even-y pairs
    (cells_per_step % 2R == 0) and never cross an x-plane boundary
    (R^2 % cells_per_step == 0). Production (R=128, 4096/step) qualifies."""
    return (grid_res % 2 == 0
            and cells_per_step % (2 * grid_res) == 0
            and grid_res ** 2 % cells_per_step == 0)


def folded_slab(fresh: jnp.ndarray, cursor: jnp.ndarray,
                cells: jnp.ndarray, grid_res: int, dtype):
    """Fold one cursor batch of fresh cells into its s2d slab + placement.

    The flat batch [cursor, cursor+B) covers x = cursor/R^2 (fixed),
    y in [y0, y0+B/R), z in [0, R); in folded space that is ONE contiguous
    slab at depth x//2, rows y0//2, channel offset (x%2)*4*C
    (requires folded_bake_supported(grid_res, B)).

    Returns (slab (1,1,B/2R,R/2,4C), d0, h0, ch_off) — d0/h0/ch_off traced
    int32 scalars in folded coordinates.
    """
    r = grid_res
    b = fresh.shape[0]
    ny = b // r
    xyz = jax.lax.dynamic_slice(cells, (cursor, jnp.int32(0)), (b, 3))
    full = jnp.concatenate([fresh, xyz], axis=-1).astype(dtype)  # (B,7)
    # (B,7) over (y,z) C-order -> (h2, w2, fh*fw*c): y = 2*hh+fh, z = 2*ww+fw
    slab = full.reshape(ny // 2, 2, r // 2, 2, GRID_CHANNELS)
    slab = slab.transpose(0, 2, 1, 3, 4).reshape(
        1, 1, ny // 2, r // 2, 4 * GRID_CHANNELS)
    x_plane = cursor // (r * r)
    y0 = (cursor % (r * r)) // r
    return slab, x_plane // 2, y0 // 2, (x_plane % 2) * 4 * GRID_CHANNELS


def bake_cells_folded(folded: jnp.ndarray, cursor: jnp.ndarray,
                      fresh: jnp.ndarray, cells: jnp.ndarray,
                      grid_res: int) -> jnp.ndarray:
    """Splice one cursor batch of fresh cells into the PRE-FOLDED grid.

    Same detach-then-write-live gradient semantics as bake_cells, but the
    splice lands directly in the s2d layout the ResNet stem consumes, so
    neither the forward fold nor its full-volume backward ever runs inside
    the train step (see folded_slab for the geometry).
    """
    base = jax.lax.stop_gradient(folded)
    slab, d0, h0, ch_off = folded_slab(fresh, cursor, cells, grid_res,
                                       base.dtype)
    return jax.lax.dynamic_update_slice(
        base, slab, (jnp.int32(0), d0, h0, jnp.int32(0), ch_off))


def bake_cells(grid_flat: jnp.ndarray, cursor: jnp.ndarray,
               fresh: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Splice fresh cells into a detached grid; advance the cursor (with wrap).

    Returns (new_grid, new_cursor). The returned grid carries gradients only
    through `fresh` — the reference's detach-then-write semantics.
    """
    base = jax.lax.stop_gradient(grid_flat)
    new_grid = jax.lax.dynamic_update_slice(
        base, fresh.astype(base.dtype), (cursor, jnp.int32(0)))
    n_cells = grid_flat.shape[0]
    new_cursor = (cursor + fresh.shape[0]) % n_cells
    return new_grid, new_cursor
