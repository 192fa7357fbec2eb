"""Checkpoint save/restore (orbax).

The reference saves every 20k steps keeping all checkpoints
(NeRAF_config.py:76-77) and serializes the baked scene grid alongside model
weights (NeRAF_pipeline.py:492-497). Here the whole train state — params,
optimizer states, grid buffer, cursor, step, PRNG key — is one pytree, so
"grid is state" holds by construction.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


_DERIVED_FIELDS = ("grid_folded",)  # refolded from `grid` on restore


def _strip_derived(state: Any) -> Any:
    """Drop derived leaves (the pre-folded grid copy) before serialization.

    Keeps checkpoints byte-compatible across rounds in both directions:
    orbax stores NamedTuples keyed by field name, so a dict with the same
    remaining keys round-trips into either state shape.
    """
    if hasattr(state, "_fields") and any(f in state._fields
                                         for f in _DERIVED_FIELDS):
        return {k: v for k, v in state._asdict().items()
                if k not in _DERIVED_FIELDS}
    return state


def save_checkpoint(ckpt_dir: str | Path, step: int, state: Any,
                    keep_all: bool = True) -> Path:
    """Write state pytree to <ckpt_dir>/step-<step>."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step-{step:09d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _strip_derived(state), force=True)
    ckptr.wait_until_finished()
    if not keep_all:
        for p in sorted(ckpt_dir.glob("step-*")):
            if p != path:
                import shutil

                shutil.rmtree(p, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    # skip "*.orbax-checkpoint-tmp*" dirs: a crash mid-save leaves one behind
    # and orbax refuses to restore it — resume must fall back to the last
    # COMPLETE checkpoint. Substring (not endswith) match: some orbax
    # TemporaryPath implementations append "-<timestamp>" after the suffix.
    steps = sorted(p for p in ckpt_dir.glob("step-*")
                   if ".orbax-checkpoint-tmp" not in p.name)
    return steps[-1] if steps else None


def restore_checkpoint(path: str | Path, target: Any) -> Any:
    """Restore into the structure of `target` (an abstract or concrete pytree).

    Derived fields (grid_folded) are never stored: they are recomputed from
    the restored flat grid — bit-identical to what the live state carried,
    since the folded copy is by construction the cast of the flat grid."""
    ckptr = ocp.StandardCheckpointer()
    stripped = _strip_derived(target)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, stripped)
    restored = ckptr.restore(Path(path).absolute(), abstract)
    if stripped is target:
        return restored
    extras = {}
    for f in _DERIVED_FIELDS:
        if f not in target._fields:
            continue
        tgt_leaf = getattr(target, f)
        if f == "grid_folded" and tgt_leaf is not None:
            from neraf_tpu.models.grid import fold_grid

            grid = restored["grid"]
            grid_res = round(grid.shape[0] ** (1.0 / 3.0))
            extras[f] = fold_grid(grid, grid_res, tgt_leaf.dtype)
        else:
            extras[f] = tgt_leaf
    return type(target)(**restored, **extras)
