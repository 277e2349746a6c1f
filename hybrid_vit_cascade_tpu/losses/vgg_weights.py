"""Offline VGG16 weight conversion: torchvision state_dict → flax pytree.

The reference's TriPlanarVGGLoss loads ImageNet-pretrained torchvision VGG16
(`loss_multiscale.py:54-77`) and taps relu1_2 / relu2_2 / relu3_3
(`features[:4] / [:9] / [:16]`). ImageNet weights are unobtainable in this
offline environment, so `TriPlanarPerceptualLoss` defaults to fixed-seed
random frozen filters (measured ablation Δ≈−0.3 dB, scripts/ablate_vgg.py).
This module is the tested path to EXACT parity the moment a weight file
becomes available:

    variables = load_vgg16_variables("vgg16_relu3_3.npz")
    loss = TriPlanarPerceptualLoss(variables=variables)

Conversion handles the torchvision layout: `features.N.weight` of shape
(out, in, kh, kw) → flax `Conv_i.kernel` (kh, kw, in, out). Only the conv
prefix through conv3_3 (features indices 0,2,5,7,10,12,14) is needed — the
taps never read past relu3_3.
"""

from __future__ import annotations

import numpy as np

# torchvision `vgg16().features` indices of the seven conv layers up to
# conv3_3, in forward order. ReLU/MaxPool layers carry no weights.
_TORCHVISION_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14)
# (in_channels, out_channels) per conv — used to validate a candidate file.
_CONV_SHAPES = ((3, 64), (64, 64), (64, 128), (128, 128),
                (128, 256), (256, 256), (256, 256))


def convert_torch_state_dict(state_dict) -> dict:
    """torchvision VGG16 state_dict (or any dict containing the
    `features.N.{weight,bias}` tensors, possibly nested under 'state_dict'
    or prefixed e.g. 'module.') → flax variables for _VGG16Features.

    Accepts torch tensors or numpy arrays as values. Raises KeyError/ValueError
    with a precise message when the file isn't a VGG16 conv prefix.
    """
    if "state_dict" in state_dict and not any(k.startswith("features.") for k in state_dict):
        state_dict = state_dict["state_dict"]

    def _find(suffix):
        # tolerate common prefixes: '', 'module.', 'vgg.' etc.
        hits = [k for k in state_dict if k.endswith(suffix)]
        if not hits:
            raise KeyError(f"no key ending in '{suffix}' in checkpoint "
                           f"(keys: {sorted(state_dict)[:8]}...)")
        if len(hits) > 1:
            hits = sorted(hits, key=len)  # shortest = least-prefixed
        return state_dict[hits[0]]

    def _np(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    params = {}
    for i, (tv_idx, (cin, cout)) in enumerate(zip(_TORCHVISION_CONV_INDICES, _CONV_SHAPES)):
        w = _np(_find(f"features.{tv_idx}.weight")).astype(np.float32)
        b = _np(_find(f"features.{tv_idx}.bias")).astype(np.float32)
        if w.shape != (cout, cin, 3, 3):
            raise ValueError(f"features.{tv_idx}.weight has shape {w.shape}, "
                             f"expected {(cout, cin, 3, 3)} — not a VGG16 checkpoint?")
        if b.shape != (cout,):
            raise ValueError(f"features.{tv_idx}.bias has shape {b.shape}, expected {(cout,)}")
        # torch (out, in, kh, kw) → flax (kh, kw, in, out)
        params[f"Conv_{i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


def save_vgg16_variables(variables: dict, path: str) -> None:
    """Persist converted variables as a flat .npz (no pickle, no torch dep)."""
    flat = {}
    for conv, leaves in variables["params"].items():
        for name, arr in leaves.items():
            flat[f"{conv}.{name}"] = np.asarray(arr)
    np.savez(path, **flat)


def load_vgg16_variables(path: str) -> dict:
    """Load a .npz written by save_vgg16_variables → flax variables dict
    ready for TriPlanarPerceptualLoss(variables=...)."""
    with np.load(path) as z:
        params = {}
        for key in z.files:
            conv, name = key.rsplit(".", 1)
            params.setdefault(conv, {})[name] = z[key]
    missing = {f"Conv_{i}" for i in range(len(_TORCHVISION_CONV_INDICES))} - set(params)
    if missing:
        raise ValueError(f"{path} is missing converted layers: {sorted(missing)}")
    return {"params": params}


def convert_torch_file(src: str, dst: str) -> dict:
    """One-shot: torch .pth/.pt checkpoint file → converted .npz. Returns the
    variables. Requires torch only here (conversion is offline; the training
    path never imports torch)."""
    import torch

    obj = torch.load(src, map_location="cpu", weights_only=True)
    variables = convert_torch_state_dict(obj)
    save_vgg16_variables(variables, dst)
    return variables
