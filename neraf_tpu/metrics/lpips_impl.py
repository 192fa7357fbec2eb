"""LPIPS perceptual distance, implemented natively in JAX.

Replaces torchmetrics' `LearnedPerceptualImagePatchSimilarity` used by the
inherited Nerfacto eval (invoked via reference NeRAF_pipeline.py:328). The
LPIPS definition (Zhang et al., CVPR 2018): run both images through a frozen
ImageNet backbone (AlexNet or VGG16), unit-normalize each selected feature
map across channels, take squared differences, apply a learned non-negative
1x1-conv head per layer, spatially average and sum over layers.

Weights: this environment has no network egress, so pretrained weights cannot
be fetched here. Instead this module ships:

- the exact backbone architectures (AlexNet / VGG16 `features` stacks with
  torchvision layer indexing) as pure-JAX functions,
- a converter from the torch checkpoint formats (`lpips` package lin-head
  files like `alex.pth`, full `LPIPS.state_dict()` saves with
  `net.slice{k}.{idx}.weight` keys, and torchvision backbone state dicts with
  `features.{idx}.weight` keys) to a flat numpy param dict,
- a portable `.npz` save/load for the converted params (no torch needed at
  inference time).

To enable LPIPS in eval, convert once on any machine with the weights:

    import torch
    import neraf_tpu.metrics.lpips_impl as L
    params = L.params_from_torch_state_dicts(
        [torch.load("torchvision_alexnet.pth"), torch.load("lpips_alex.pth")],
        net="alex")
    L.save_params_npz("~/.cache/neraf/lpips_alex.npz", params, net="alex")

then point `NERAF_LPIPS_WEIGHTS` at the `.npz` (or drop it at the default
cache path). Parity with the torch reference implementation is tested in
tests/test_lpips.py by loading identical random weights into a torch twin.
"""

from __future__ import annotations

import functools
import os
import re
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

# torchvision `features` Sequential conv indices and the layer index after
# whose ReLU each LPIPS slice is taken. (lpips/pretrained_networks.py slices:
# alex (0,2),(2,5),(5,8),(8,10),(10,12); vgg (0,4),(4,9),(9,16),(16,23),(23,30).)
_ALEX_CONVS = {
    0: dict(cin=3, cout=64, k=11, stride=4, pad=2),
    3: dict(cin=64, cout=192, k=5, stride=1, pad=2),
    6: dict(cin=192, cout=384, k=3, stride=1, pad=1),
    8: dict(cin=384, cout=256, k=3, stride=1, pad=1),
    10: dict(cin=256, cout=256, k=3, stride=1, pad=1),
}
_ALEX_POOLS = {2: (3, 2), 5: (3, 2), 12: (3, 2)}  # idx -> (kernel, stride)
_ALEX_TAPS = (1, 4, 7, 9, 11)  # layer index whose output is a slice endpoint
_ALEX_CHANNELS = (64, 192, 384, 256, 256)

_VGG_CONV_IDXS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_CHANNELS_PER_CONV = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_VGG_CONVS = {
    idx: dict(
        cin=(3 if i == 0 else _VGG_CHANNELS_PER_CONV[i - 1]),
        cout=_VGG_CHANNELS_PER_CONV[i],
        k=3,
        stride=1,
        pad=1,
    )
    for i, idx in enumerate(_VGG_CONV_IDXS)
}
_VGG_POOLS = {4: (2, 2), 9: (2, 2), 16: (2, 2), 23: (2, 2), 30: (2, 2)}
_VGG_TAPS = (3, 8, 15, 22, 29)
_VGG_CHANNELS = (64, 128, 256, 512, 512)

_NETS = {
    "alex": dict(convs=_ALEX_CONVS, pools=_ALEX_POOLS, taps=_ALEX_TAPS, channels=_ALEX_CHANNELS),
    "vgg": dict(convs=_VGG_CONVS, pools=_VGG_POOLS, taps=_VGG_TAPS, channels=_VGG_CHANNELS),
}

# ScalingLayer constants from the LPIPS reference (ImageNet mean/std expressed
# for inputs in [-1, 1]).
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def init_params(net: str, key: jax.Array | None = None) -> dict:
    """Random params with the exact shapes of the pretrained checkpoints.

    Used by tests and as the shape spec for the converter; real use loads
    converted pretrained weights.
    """
    spec = _NETS[net]
    if key is None:
        key = jax.random.PRNGKey(0)
    params: dict[str, np.ndarray] = {}
    for idx, c in spec["convs"].items():
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = c["cin"] * c["k"] * c["k"]
        params[f"conv{idx}.w"] = np.asarray(
            jax.random.normal(k1, (c["cout"], c["cin"], c["k"], c["k"])) / np.sqrt(fan_in),
            np.float32,
        )
        params[f"conv{idx}.b"] = np.asarray(
            jax.random.normal(k2, (c["cout"],)) * 0.01, np.float32
        )
    for i, ch in enumerate(spec["channels"]):
        key, k1 = jax.random.split(key)
        params[f"lin{i}.w"] = np.asarray(
            jnp.abs(jax.random.normal(k1, (ch,))) / ch, np.float32
        )
    return params


def _features(params: dict, x: jnp.ndarray, net: str) -> list[jnp.ndarray]:
    """Backbone feature maps at the 5 LPIPS taps. x: (N, 3, H, W)."""
    spec = _NETS[net]
    taps = []
    last = max(spec["taps"])
    for idx in range(last + 1):
        if idx in spec["convs"]:
            c = spec["convs"][idx]
            w = jnp.asarray(params[f"conv{idx}.w"])
            b = jnp.asarray(params[f"conv{idx}.b"])
            x = jax.lax.conv_general_dilated(
                x, w,
                window_strides=(c["stride"], c["stride"]),
                padding=[(c["pad"], c["pad"])] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]
        elif idx in spec["pools"]:
            k, s = spec["pools"][idx]
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 1, k, k),
                window_strides=(1, 1, s, s),
                padding="VALID",
            )
        else:  # ReLU (every non-conv, non-pool index in both stacks)
            x = jax.nn.relu(x)
        if idx in spec["taps"]:
            taps.append(x)
    return taps


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    # Matches lpips.normalize_tensor: x / (||x||_channels + eps).
    norm = jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True))
    return feat / (norm + eps)


@functools.partial(jax.jit, static_argnames=("net", "normalize"))
def lpips_distance(
    params: dict,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    net: str = "alex",
    normalize: bool = True,
) -> jnp.ndarray:
    """LPIPS(pred, target).

    Args:
        params: converted weight dict (see `params_from_torch_state_dicts`).
        pred, target: (H, W, 3) or (N, H, W, 3) images; in [0, 1] when
            `normalize=True` (the torchmetrics `normalize=True` convention the
            reference's Nerfacto eval uses), else already in [-1, 1].
    Returns: scalar (or (N,) for batched input) perceptual distance.
    """
    batched = pred.ndim == 4
    if not batched:
        pred, target = pred[None], target[None]
    # Below these sizes a pooled feature map would be empty (spatial mean over
    # zero elements -> NaN); fail loudly instead.
    min_size = {"alex": 32, "vgg": 16}[net]
    if min(pred.shape[1], pred.shape[2]) < min_size:
        raise ValueError(
            f"LPIPS({net}) needs images >= {min_size}px per side, got {pred.shape[1:3]}")
    # HWC -> NCHW
    x = jnp.moveaxis(pred.astype(jnp.float32), -1, 1)
    y = jnp.moveaxis(target.astype(jnp.float32), -1, 1)
    if normalize:
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x = (x - shift) / scale
    y = (y - shift) / scale

    fx = _features(params, x, net)
    fy = _features(params, y, net)
    total = jnp.zeros((x.shape[0],), jnp.float32)
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = jnp.asarray(params[f"lin{i}.w"])  # (C,) non-negative learned head
        total = total + jnp.mean(jnp.sum(d * w[None, :, None, None], axis=1), axis=(1, 2))
    return total if batched else total[0]


# ---------------------------------------------------------------------------
# Weight conversion / IO
# ---------------------------------------------------------------------------

_KEY_RE = re.compile(r"(?:net\.slice\d+|features)\.(\d+)\.(weight|bias)$")
_LIN_RE = re.compile(r"lins?\.?(\d)\.model\.1\.weight$")


def params_from_torch_state_dicts(state_dicts, net: str = "alex") -> dict:
    """Convert torch checkpoints to the flat param dict used here.

    Accepts any mix of: torchvision backbone state dicts (`features.{i}.*`),
    full `lpips.LPIPS.state_dict()` saves (`net.slice{k}.{i}.*` +
    `lin{j}.model.1.weight`), and the lpips package's shipped lin-head files
    (`lin{j}.model.1.weight` only). Later dicts win on key collisions.
    """
    spec = _NETS[net]
    params: dict[str, np.ndarray] = {}
    for sd in state_dicts:
        for key, val in sd.items():
            arr = np.asarray(getattr(val, "numpy", lambda: val)(), dtype=np.float32) \
                if hasattr(val, "numpy") else np.asarray(val, np.float32)
            m = _KEY_RE.search(key)
            if m:
                idx, kind = int(m.group(1)), m.group(2)
                if idx in spec["convs"]:
                    params[f"conv{idx}.{'w' if kind == 'weight' else 'b'}"] = arr
                continue
            m = _LIN_RE.search(key)
            if m:
                params[f"lin{int(m.group(1))}.w"] = arr.reshape(-1)  # (1,C,1,1) -> (C,)
    missing = _missing_keys(params, net)
    if missing:
        raise ValueError(f"LPIPS conversion incomplete for net={net}; missing: {missing}")
    return params


def _missing_keys(params: dict, net: str) -> list[str]:
    spec = _NETS[net]
    want = [f"conv{i}.{s}" for i in spec["convs"] for s in ("w", "b")]
    want += [f"lin{i}.w" for i in range(len(spec["channels"]))]
    return [k for k in want if k not in params]


def save_params_npz(path: str | Path, params: dict, net: str) -> None:
    path = Path(path).expanduser()
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, __net__=np.asarray(net), **{k: np.asarray(v) for k, v in params.items()})


@functools.lru_cache(maxsize=4)
def load_params(path: str) -> tuple[dict, str]:
    """Load converted params. `.npz` natively; `.pt/.pth` via torch if present."""
    p = Path(path).expanduser()
    if p.suffix == ".npz":
        with np.load(p) as z:
            net = str(z["__net__"]) if "__net__" in z else "alex"
            params = {k: z[k] for k in z.files if k != "__net__"}
    else:
        import torch  # noqa: PLC0415 — only needed for torch-format files

        sd = torch.load(p, map_location="cpu", weights_only=True)
        try:
            params, net = params_from_torch_state_dicts([sd], net="alex"), "alex"
        except ValueError:
            params, net = params_from_torch_state_dicts([sd], net="vgg"), "vgg"
    missing = _missing_keys(params, net)
    if missing:
        raise ValueError(f"LPIPS weights at {path} incomplete: missing {missing}")
    return params, net


_DEFAULT_PATHS = (
    "~/.cache/neraf/lpips_alex.npz",
    "~/.cache/neraf/lpips_vgg.npz",
)


def resolve_default_weights() -> str | None:
    """Weight-file discovery: NERAF_LPIPS_WEIGHTS env var, then cache paths."""
    env = os.environ.get("NERAF_LPIPS_WEIGHTS")
    if env and Path(env).expanduser().exists():
        return env
    for cand in _DEFAULT_PATHS:
        if Path(cand).expanduser().exists():
            return cand
    return None
