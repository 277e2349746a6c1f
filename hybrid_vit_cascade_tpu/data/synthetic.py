"""Procedural chest-CT phantoms + synthetic DRR pairs.

The reference has no synthetic data path — its smoke tests use torch.randn
(SURVEY.md §4). Random noise can't exercise reconstruction (there's no
structure to recover), so this module generates deterministic anatomical
phantoms (body ellipsoid, two lungs, spine, ribs-ish shells) in HU, windows
them like the real pipeline, and renders the AP/Lateral DRR pair with the
same Beer–Lambert projector used by the physics losses. Powers unit tests,
the synthetic-overfit acceptance gate (mirrors the reference's
'>15 dB by epoch 3' gate, start_direct_training.sh:16-21) and the benchmark.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..ops.resize import resize_trilinear_np as _np_resize_trilinear


def make_phantom_volume(size: int = 64, seed: int = 0) -> np.ndarray:
    """(size, size, size) float32 volume in HU (approximately [-1000, 1000])."""
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:size, 0:size, 0:size].astype(np.float32) / size - 0.5

    hu = np.full((size, size, size), -1000.0, np.float32)  # air

    def ellipsoid(cz, cy, cx, rz, ry, rx):
        return ((z - cz) / rz) ** 2 + ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2 <= 1.0

    jit = lambda s: float(rng.normal(0, s))
    # body (soft tissue ~40 HU)
    body = ellipsoid(jit(0.01), jit(0.01), jit(0.01), 0.42, 0.38, 0.45)
    hu[body] = 40.0
    # lungs (~ -800 HU)
    for side in (-1, 1):
        lung = ellipsoid(0.02 + jit(0.01), -0.03, side * (0.18 + jit(0.01)), 0.30, 0.24, 0.16)
        hu[lung & body] = -800.0
    # spine (bone ~700 HU)
    spine = ((y - 0.22) ** 2 + x ** 2) <= (0.06 + jit(0.004)) ** 2
    hu[spine & body] = 700.0
    # heart-ish blob (~100 HU)
    heart = ellipsoid(0.05, 0.02, -0.04 + jit(0.01), 0.14, 0.13, 0.13)
    hu[heart & body] = 100.0
    # rib shells: thin high-HU band at the body boundary, modulated along z
    r = np.sqrt((y / 0.38) ** 2 + (x / 0.45) ** 2)
    shell = (r > 0.88) & (r < 0.97) & body
    ribs = shell & (np.sin(z * 40.0 + jit(0.5)) > 0.3)
    hu[ribs] = 500.0
    # mild texture
    hu += rng.normal(0.0, 15.0, hu.shape).astype(np.float32)
    return hu


def window_volume(hu: np.ndarray, preset: str = "soft_tissue") -> np.ndarray:
    """HU → normalized volume (matches dataset presets)."""
    if preset == "soft_tissue":  # utils/dataset.py:219-229 → [-1, 1]
        v = np.clip(hu, -200.0, 200.0)
        return ((v + 200.0) / 400.0 * 2.0 - 1.0).astype(np.float32)
    if preset == "full":  # dataset_simple.py:103-104 → [0, 1]
        v = np.clip(hu, -1024.0, 3071.0)
        return ((v + 1024.0) / 4095.0).astype(np.float32)
    raise ValueError(preset)


def render_drr_pair(volume: np.ndarray, img_size: int = 512, mu: float = 0.3) -> np.ndarray:
    """Beer–Lambert AP + lateral DRRs of a [-1,1] volume → (2, 1, S, S) in [0,1]."""
    att = np.exp(-mu * (volume.astype(np.float32) + 1.0))
    ap = att.sum(axis=0)  # (H, W)
    lat = att.sum(axis=2).T  # (H, D) → matches reference transpose
    out = []
    for img in (ap, lat):
        img = (img - img.min()) / (img.max() - img.min() + 1e-8)
        img = _np_resize_trilinear(img[None], (1, img_size, img_size))[0]
        out.append(img[None])
    return np.stack(out).astype(np.float32)  # (2, 1, S, S)


class SyntheticCTDataset:
    """Deterministic phantom dataset with the PatientDRRDataset item schema."""

    def __init__(
        self,
        num_patients: int = 16,
        volume_size: Tuple[int, int, int] = (64, 64, 64),
        xray_size: int = 512,
        preset: str = "soft_tissue",
        seed: int = 0,
    ):
        self.num_patients = num_patients
        self.volume_size = tuple(volume_size)
        self.xray_size = xray_size
        self.preset = preset
        self.seed = seed
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self) -> int:
        return self.num_patients

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if idx in self._cache:
            return self._cache[idx]
        base = max(self.volume_size)
        hu = make_phantom_volume(base, seed=self.seed * 10007 + idx)
        vol = window_volume(hu, self.preset)
        if vol.shape != self.volume_size:
            vol = _np_resize_trilinear(vol, self.volume_size)
        drr = render_drr_pair(vol, self.xray_size)
        item = {
            "ct_volume": vol[None],  # (1, D, H, W)
            "drr_stacked": drr,  # (2, 1, S, S)
            "drr_frontal": drr[0],
            "drr_lateral": drr[1],
            "patient_id": f"phantom_{idx:04d}",
        }
        self._cache[idx] = item
        return item
