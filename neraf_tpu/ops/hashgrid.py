"""Multiresolution hash-grid encoding (instant-NGP style), TPU-native.

Replaces the tinycudann HashGrid encoding that powers Nerfacto's field in the
reference stack (SURVEY.md §2.3). Functionally: L resolution levels geometric
from base_res to max_res, each backed by a 2^log2_table_size feature table;
a query trilinearly interpolates the 8 surrounding corners per level and
concatenates level features.

Design notes (TPU, from measured axon-backend cost model — see
docs/HASH_PERF.md):
- Gather cost on this backend is ~5-6 ns PER ROW, nearly independent of row
  width up to 16 bytes (F=4 fp32); sliced gathers (slice_sizes > 1 row) are
  ~280x slower and Mosaic/Pallas rejects vectorized dynamic indexing
  ("Cannot do int indexing on TPU"). Therefore the only lever is ROW COUNT.
- The encoding is ONE flat advanced-index gather over a (L*2^T, F) view of
  the table: all levels x corners x batch in a single gather (a 16-level
  loop of take_along_axis measured 3.6x slower than the fused form).
- Coarse levels whose dense grid fits the table use direct (collision-free)
  linear indexing into the same buffer; fine levels use the instant-NGP
  XOR-prime hash.
- Preferred capacity layout is FEWER levels x MORE features per level
  (L8xF4 halves gather rows vs tcnn's L16xF2 at identical out_dim and table
  bytes); VisionModelConfig defaults to that, with L16xF2 reachable by
  config for strict tcnn-parity experiments.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# instant-NGP spatial hash primes (pi_1 = 1 keeps x contiguous)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of a multires hash encoding.

    grad_mode selects the table-gradient strategy (see gather_rows):
      - "auto": "scatter" on CPU/GPU (XLA-native, fastest there);
        "scatter_set" on TPU — the axon backend's scatter-ADD crashes the
        worker after ~100 cumulative executions (docs/HASH_PERF.md:67-92),
        while the sort+cumsum+unique-overwrite form avoids add-combining.
      - "scatter" / "scatter_set" / "gather" force a strategy ("gather" is
        fully scatter-free: sort + cumsum + segment-boundary gathers — the
        guaranteed-safe fallback if overwrite scatter also faults).
    """

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    grad_mode: str = "auto"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.base_res)) / (self.num_levels - 1))
        )

    def resolutions(self) -> np.ndarray:
        lvl = np.arange(self.num_levels)
        return np.floor(self.base_res * self.growth_factor**lvl).astype(np.int32)


def init_hash_table(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init, matching instant-NGP/tcnn."""
    shape = (spec.num_levels, spec.table_size, spec.features_per_level)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# --------------------------------------------------------------------------
# Row gather with a selectable-backward custom VJP.
#
# The autodiff backward of a row gather is an XLA scatter-ADD into the table
# — which crashes the axon TPU worker after ~100 cumulative executions
# (docs/HASH_PERF.md:67-92), killing hash-grid TRAINING on that backend. The
# replacement gradients here reformulate the segment reduction so no
# add-combining scatter executes:
#
#   scatter_set: sort contributions by row index; a cumulative sum along the
#     sorted order gives each duplicate-row RUN's total at its last element
#     (csum[end] - csum[before start], the "before start" value fetched with
#     a cummax-of-run-starts gather); ONE overwrite scatter (unique indices,
#     mode=drop) places the totals into the dense gradient. No combiner.
#   gather: additionally replaces that final placement with
#     searchsorted(sorted_idx, arange(rows+1)) segment boundaries and a
#     boundary-difference gather — zero scatters of any kind, at
#     O(rows * log n_contributions) gather cost. Fallback if the backend
#     faults on overwrite scatter too.
#
# Gradients w.r.t. POSITIONS are unaffected: they flow through the trilinear
# weights outside this primitive (idx is integral).
# --------------------------------------------------------------------------


# Sort-length cap for the sort-based table gradients: 2M rows compiles in
# ~60 s on the remote TPU compiler, while the full 12.6M-row training load
# never finished compiling (>10 min) — see gather_rows docstring.
# Env-overridable for sweeps (scripts/hash_joint_bench.py); read at trace
# time, so a change retraces/recompiles as intended.
import os as _os

_BWD_SORT_CHUNK = int(_os.environ.get("NERAF_HASH_BWD_CHUNK", 2 ** 21))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_rows(table2d: jnp.ndarray, idx: jnp.ndarray, n_rows: int,
                grad_mode: str, bwd_chunk: int | None = None) -> jnp.ndarray:
    """table2d[(n_rows, F)][idx (M,)] -> (M, F), with a chosen VJP strategy.

    bwd_chunk (static): cap on contributions per sort in the sort-based
    backwards. The remote TPU compiler's sort lowering scales superlinearly
    with array length (measured: 61 s compile at 2.1M rows, >10 min — never
    observed finishing — at 12.6M, the real 4096-ray x 48-sample training
    load). With bwd_chunk set, the backward runs ceil(M/bwd_chunk)
    sort+segment-sum chunks inside ONE lax.scan (body compiled once at the
    chunk shape) and accumulates DENSE per-chunk gradients — a plain add,
    no combiner scatter, exact because partial segment sums add. A vmapped
    per-level batching was tried first and compiles even worse than flat
    (batched sort/scatter lowering; same probe timed out at 2.1M).
    """
    return table2d[idx]


def _gather_rows_fwd(table2d, idx, n_rows, grad_mode, bwd_chunk):
    return table2d[idx], idx


def _resolve_grad_mode(grad_mode: str) -> str:
    if grad_mode != "auto":
        return grad_mode
    # the session's TPU registers as platform "axon" (tunneled PJRT plugin)
    return ("scatter_set" if jax.default_backend() in ("tpu", "axon")
            else "scatter")


def _segment_totals_sorted(sidx: jnp.ndarray, sval: jnp.ndarray):
    """Per-run totals of duplicate-index runs in a sorted contribution list.

    Returns (is_end (M,) bool, totals (M, F)) where totals[m] is the full
    run sum for the run ending at m (valid only where is_end).
    """
    m = sidx.shape[0]
    csum = jnp.cumsum(sval, axis=0)  # (M, F) inclusive
    ecs = jnp.concatenate([jnp.zeros_like(sval[:1]), csum[:-1]], axis=0)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    is_end = jnp.concatenate(
        [sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    # run_start[m] = index of the start of m's run (cummax propagates the
    # latest start position forward)
    start_pos = jnp.where(is_start, jnp.arange(m), 0)
    run_start = jax.lax.associative_scan(jnp.maximum, start_pos)
    totals = csum - ecs[run_start]  # exact at run ends
    return is_end, totals


def _sorted_segment_grad(idx, g, n_rows, mode):
    """Dense (n_rows, F) gradient from contributions via one sort."""
    F = g.shape[-1]
    order = jnp.argsort(idx)
    sidx = idx[order]
    sval = g[order]
    if mode == "scatter_set":
        is_end, totals = _segment_totals_sorted(sidx, sval)
        # unique-index overwrite placement; non-ends dropped via row n_rows
        put_at = jnp.where(is_end, sidx, n_rows)
        return jnp.zeros((n_rows, F), g.dtype).at[put_at].set(
            totals, mode="drop")
    if mode == "gather":
        csum = jnp.concatenate(
            [jnp.zeros_like(sval[:1]), jnp.cumsum(sval, axis=0)], axis=0)
        bounds = jnp.searchsorted(
            sidx, jnp.arange(n_rows + 1, dtype=sidx.dtype), side="left")
        return (csum[bounds[1:]] - csum[bounds[:-1]]).astype(g.dtype)
    raise ValueError(f"unknown grad_mode {mode!r}")


def _gather_rows_bwd(n_rows, grad_mode, bwd_chunk, idx, g):
    mode = _resolve_grad_mode(grad_mode)
    F = g.shape[-1]
    M = idx.shape[0]
    if mode == "scatter":
        grad = jnp.zeros((n_rows, F), g.dtype).at[idx].add(g)
        return grad, None
    if bwd_chunk is None or M <= bwd_chunk:
        return _sorted_segment_grad(idx, g, n_rows, mode), None

    # chunked: pad with sentinel row n_rows (zero cotangent, dropped by both
    # strategies), then scan sort-sized chunks, accumulating dense partials
    n_chunks = -(-M // bwd_chunk)
    pad = n_chunks * bwd_chunk - M
    idx_p = jnp.concatenate(
        [idx, jnp.full((pad,), n_rows, idx.dtype)]).reshape(n_chunks, -1)
    g_p = jnp.concatenate(
        [g, jnp.zeros((pad, F), g.dtype)]).reshape(n_chunks, -1, F)

    def body(acc, chunk):
        ci, cg = chunk
        return acc + _sorted_segment_grad(ci, cg, n_rows, mode), None

    grad, _ = jax.lax.scan(body, jnp.zeros((n_rows, F), g.dtype),
                           (idx_p, g_p))
    return grad, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.jit, static_argnames=("spec",))
def hash_encoding(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode positions through the multires hash grid.

    Args:
        table: (L, table_size, F) feature tables.
        x: (..., 3) positions in [0, 1] (out-of-range values clamp).
    Returns:
        (..., L*F) concatenated per-level features.
    """
    lead = x.shape[:-1]
    xf = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)  # (B, 3)
    B = xf.shape[0]

    resolutions = jnp.asarray(spec.resolutions())  # (L,)

    # (L, B, 3) scaled coordinates
    pos = xf[None, :, :] * resolutions[:, None, None].astype(xf.dtype)
    c0 = jnp.floor(pos)
    frac = pos - c0
    c0 = c0.astype(jnp.int32)

    # 8 corner offsets, (8, 3)
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
    )
    # (L, B, 8, 3) corner integer coords, clamped to the grid
    cidx = c0[:, :, None, :] + corners[None, None, :, :]
    cidx = jnp.minimum(cidx, resolutions[:, None, None, None])

    # dense vs hashed indexing per level (static decision per level)
    res_np = spec.resolutions()
    dense_mask = ((res_np.astype(np.int64) + 1) ** 3) <= spec.table_size  # (L,)
    dense_mask_j = jnp.asarray(dense_mask)[:, None, None]

    stride = (resolutions + 1).astype(jnp.uint32)
    cu = cidx.astype(jnp.uint32)
    dense_idx = (
        cu[..., 0]
        + cu[..., 1] * stride[:, None, None]
        + cu[..., 2] * stride[:, None, None] * stride[:, None, None]
    )
    hashed_idx = (
        cu[..., 0] * np.uint32(_PRIMES[0])
        ^ cu[..., 1] * np.uint32(_PRIMES[1])
        ^ cu[..., 2] * np.uint32(_PRIMES[2])
    ) % np.uint32(spec.table_size)
    idx = jnp.where(dense_mask_j, dense_idx, hashed_idx).astype(jnp.int32)  # (L, B, 8)

    # trilinear weights (L, B, 8)
    w = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    weights = jnp.prod(w, axis=-1)

    # ONE fused gather over all levels x corners: flatten the table to
    # (L*T, F) and offset each level's indices by level*T. Row count is the
    # measured cost driver on this backend; a per-level gather loop is ~3.6x
    # slower for identical rows.
    level_offset = (jnp.arange(spec.num_levels, dtype=jnp.int32) * spec.table_size)
    flat_idx = (idx + level_offset[:, None, None]).reshape(-1)  # (L*B*8,)
    feats = gather_rows(table.reshape(-1, spec.features_per_level), flat_idx,
                        spec.num_levels * spec.table_size, spec.grad_mode,
                        _BWD_SORT_CHUNK)
    feats = feats.reshape(spec.num_levels, B, 8, spec.features_per_level)

    out = jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=2)  # (L, B, F)
    out = jnp.moveaxis(out, 0, 1).reshape(B, spec.out_dim)
    return out.reshape(*lead, spec.out_dim)
