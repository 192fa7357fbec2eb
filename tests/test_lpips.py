"""LPIPS parity tests: the JAX implementation vs a torch twin.

Builds the exact torch architecture LPIPS uses (torchvision AlexNet/VGG16
`features` stacks + 1x1 lin heads, forward per the lpips reference
implementation), loads IDENTICAL weights into both, and asserts output
parity. This fully validates the implementation + converter without network
egress; real pretrained checkpoints drop in through the same converter.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import neraf_tpu.metrics.lpips_impl as L
from neraf_tpu.metrics.image import lpips as lpips_metric


def _torch_backbone(net: str) -> nn.Sequential:
    """`features` stack with torchvision layer indexing (state-dict parity)."""
    if net == "alex":
        return nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, stride=2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, stride=2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(3, stride=2),
        )
    layers, cin = [], 3
    for cout in (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512, "M"):
        if cout == "M":
            layers.append(nn.MaxPool2d(2, stride=2))
        else:
            layers += [nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU()]
            cin = cout
    return nn.Sequential(*layers)


_TAPS = {"alex": (1, 4, 7, 9, 11), "vgg": (3, 8, 15, 22, 29)}


def _torch_lpips(features, lin_ws, x, y, taps):
    """Reference lpips forward (lpips/lpips.py): scaling layer, backbone taps,
    channel unit-norm (eps 1e-10), squared diff, 1x1 lin head, spatial mean."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps_of(z):
        z = (z - shift) / scale
        outs = []
        for i, layer in enumerate(features):
            z = layer(z)
            if i in taps:
                outs.append(z)
        return outs

    def unit(f):
        return f / (torch.sqrt(torch.sum(f**2, dim=1, keepdim=True)) + 1e-10)

    total = 0.0
    for i, (a, b) in enumerate(zip(taps_of(x), taps_of(y))):
        d = (unit(a) - unit(b)) ** 2
        w = torch.tensor(np.asarray(lin_ws[i])).view(1, -1, 1, 1)
        total = total + torch.mean(torch.sum(d * w, dim=1), dim=(1, 2))
    return total


def _load_params_into_torch(params, features):
    with torch.no_grad():
        for i, layer in enumerate(features):
            if isinstance(layer, nn.Conv2d):
                layer.weight.copy_(torch.tensor(np.asarray(params[f"conv{i}.w"])))
                layer.bias.copy_(torch.tensor(np.asarray(params[f"conv{i}.b"])))


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_parity_with_torch_twin(net, rng):
    params = L.init_params(net)
    features = _torch_backbone(net).eval()
    _load_params_into_torch(params, features)
    lin_ws = [params[f"lin{i}.w"] for i in range(5)]

    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(L.lpips_distance(params, x, y, net=net, normalize=False))
    with torch.no_grad():
        theirs = _torch_lpips(
        features, lin_ws,
            torch.tensor(np.moveaxis(x, -1, 1)), torch.tensor(np.moveaxis(y, -1, 1)),
            _TAPS[net],
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
    assert np.all(np.isfinite(ours)) and np.all(ours > 0)


def test_identical_images_give_zero():
    params = L.init_params("alex")
    x = np.random.default_rng(1).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    d = float(L.lpips_distance(params, x, x, net="alex"))
    assert abs(d) < 1e-8


def test_converter_handles_all_torch_key_formats():
    params = L.init_params("alex")
    # torchvision backbone format + lpips package lin-head format
    tv = {}
    for idx in (0, 3, 6, 8, 10):
        tv[f"features.{idx}.weight"] = torch.tensor(np.asarray(params[f"conv{idx}.w"]))
        tv[f"features.{idx}.bias"] = torch.tensor(np.asarray(params[f"conv{idx}.b"]))
    heads = {
        f"lin{i}.model.1.weight": torch.tensor(
            np.asarray(params[f"lin{i}.w"]).reshape(1, -1, 1, 1))
        for i in range(5)
    }
    out = L.params_from_torch_state_dicts([tv, heads], net="alex")
    for k in params:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(params[k]))

    # full LPIPS.state_dict() save format (net.slice{k}.{orig_idx}.*)
    slices = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    full = {
        f"net.slice{s}.{idx}.{kind}": tv[f"features.{idx}.{kind}"]
        for idx, s in slices.items() for kind in ("weight", "bias")
    }
    full.update(heads)
    out2 = L.params_from_torch_state_dicts([full], net="alex")
    for k in params:
        np.testing.assert_array_equal(np.asarray(out2[k]), np.asarray(params[k]))

    with pytest.raises(ValueError, match="missing"):
        L.params_from_torch_state_dicts([heads], net="alex")


def test_npz_roundtrip_and_metric_api(tmp_path, rng, monkeypatch):
    params = L.init_params("alex")
    path = tmp_path / "lpips_alex.npz"
    L.save_params_npz(path, params, net="alex")

    x = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    val = float(lpips_metric(x, y, weights_path=str(path)))
    assert np.isfinite(val) and val > 0

    # env-var resolution path
    monkeypatch.setenv("NERAF_LPIPS_WEIGHTS", str(path))
    assert np.isfinite(float(lpips_metric(x, y)))

    # no weights anywhere -> NaN, never an exception
    monkeypatch.delenv("NERAF_LPIPS_WEIGHTS")
    monkeypatch.setattr(L, "_DEFAULT_PATHS", ())
    assert np.isnan(float(lpips_metric(x, y)))


def test_too_small_image_raises():
    params = L.init_params("alex")
    x = np.zeros((16, 16, 3), np.float32)
    with pytest.raises(ValueError, match="needs images"):
        L.lpips_distance(params, x, x, net="alex")


def test_pipeline_maybe_lpips_wiring(tmp_path, monkeypatch):
    """evaluate_vision/eval_image pick up LPIPS when weights resolve."""
    from neraf_tpu.engine.pipeline import _maybe_lpips

    monkeypatch.setattr(L, "_DEFAULT_PATHS", ())
    monkeypatch.delenv("NERAF_LPIPS_WEIGHTS", raising=False)
    x = np.zeros((48, 48, 3), np.float32)
    assert _maybe_lpips(x, x) is None

    path = tmp_path / "lpips_alex.npz"
    L.save_params_npz(path, L.init_params("alex"), net="alex")
    monkeypatch.setenv("NERAF_LPIPS_WEIGHTS", str(path))
    assert _maybe_lpips(x, x) == 0.0
    # too-small render -> key omitted, not an exception
    small = np.zeros((8, 8, 3), np.float32)
    assert _maybe_lpips(small, small) is None


def test_lpips_export_is_stably_a_function():
    """`neraf_tpu.metrics.lpips` must stay the metric FUNCTION even after
    the implementation submodule (lpips_impl) is imported — the round-2
    layout (submodule named `lpips`) let a later submodule import rebind
    the package attribute to a module, breaking attribute-style calls."""
    import importlib

    import neraf_tpu.metrics as M

    assert callable(M.lpips)
    importlib.import_module("neraf_tpu.metrics.lpips_impl")
    assert callable(M.lpips)
    from neraf_tpu.metrics import lpips as fn

    assert callable(fn)
