"""Loss-stack tests: torch goldens for the pure formulas, key-schema checks
for the composite losses (the reference's loss-dict contracts)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hybrid_vit_cascade_tpu import losses


def _vols(rng, size=16, b=2):
    p = rng.standard_normal((b, 1, size, size, size)).astype(np.float32)
    t = (p + 0.2 * rng.standard_normal(p.shape)).astype(np.float32)
    return p, t


class TestMetrics:
    def test_psnr_matches_reference_formula(self, rng):
        p, t = _vols(rng)
        mse = torch.mean((torch.from_numpy(p) - torch.from_numpy(t)) ** 2)
        want = (20 * torch.log10(2.0 / torch.sqrt(mse))).item()
        got = float(losses.psnr(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) < 1e-4

    def test_psnr_dynamic_range(self, rng):
        p, t = _vols(rng)
        drange = float(t.max() - t.min())
        mse = float(np.mean((p - t) ** 2))
        want = 20 * np.log10(drange / np.sqrt(mse))
        got = float(losses.psnr_dynamic_range(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) < 1e-4


class TestPureLosses:
    def test_tv_matches_torch(self, rng):
        p, t = _vols(rng)
        tp, tt = torch.from_numpy(p), torch.from_numpy(t)

        def torch_tv(v):
            dd = torch.abs(v[:, :, 1:] - v[:, :, :-1])
            dh = torch.abs(v[:, :, :, 1:] - v[:, :, :, :-1])
            dw = torch.abs(v[..., 1:] - v[..., :-1])
            tv = (torch.sqrt(dd ** 2 + 1e-8).mean() + torch.sqrt(dh ** 2 + 1e-8).mean()
                  + torch.sqrt(dw ** 2 + 1e-8).mean()) / 3
            return torch.clamp(tv, 0, 100)

        want = F.l1_loss(torch_tv(tp), torch_tv(tt)).item()
        got = float(losses.total_variation_loss(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) < 1e-5
        want_single = torch_tv(tp).item()
        got_single = float(losses.total_variation_loss(jnp.asarray(p)))
        assert abs(got_single - want_single) < 1e-5

    def test_frequency_loss_matches_torch(self, rng):
        p, t = _vols(rng)
        tp, tt = torch.from_numpy(p), torch.from_numpy(t)
        pm, tm = torch.abs(torch.fft.fftn(tp, dim=(-3, -2, -1))), torch.abs(torch.fft.fftn(tt, dim=(-3, -2, -1)))
        D = H = W = 16
        coords = torch.arange(16).float() - 8
        dd, hh, ww = torch.meshgrid(coords, coords, coords, indexing="ij")
        mask = ((dd ** 2 + hh ** 2 + ww ** 2).sqrt() > 4).float()[None, None]
        want = (F.l1_loss(pm * (1 - mask), tm * (1 - mask)) + 2.0 * F.l1_loss(pm * mask, tm * mask)).item()
        got = float(losses.frequency_loss(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) / max(abs(want), 1) < 1e-4

    def test_frequency_loss_odd_dims_fallback_matches_torch(self, rng):
        # odd spatial dims take the full-spectrum path (the index-centered
        # mask is not conjugate-symmetric there); check it against torch
        p = rng.standard_normal((1, 1, 15, 15, 15)).astype(np.float32)
        t = (p + 0.2 * rng.standard_normal(p.shape)).astype(np.float32)
        tp, tt = torch.from_numpy(p), torch.from_numpy(t)
        pm, tm = torch.abs(torch.fft.fftn(tp, dim=(-3, -2, -1))), torch.abs(
            torch.fft.fftn(tt, dim=(-3, -2, -1)))
        coords = torch.arange(15).float() - 7
        dd, hh, ww = torch.meshgrid(coords, coords, coords, indexing="ij")
        mask = ((dd ** 2 + hh ** 2 + ww ** 2).sqrt() > 3).float()[None, None]
        want = (F.l1_loss(pm * (1 - mask), tm * (1 - mask))
                + 2.0 * F.l1_loss(pm * mask, tm * mask)).item()
        got = float(losses.frequency_loss(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) / max(abs(want), 1) < 1e-4

    def test_rfft_half_spectrum_equals_full(self, rng):
        # the rfft fast path (even dims) must reproduce the full-spectrum
        # formulas exactly (up to fp32 reassociation) on asymmetric shapes
        from hybrid_vit_cascade_tpu.ops.fft import (
            fft_magnitude_3d, half_spectrum_multiplicity, high_freq_mask,
            high_freq_mask_half, rfft_magnitude_3d)

        x = jnp.asarray(rng.standard_normal((1, 1, 8, 12, 16)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 1, 8, 12, 16)).astype(np.float32))
        shape = (8, 12, 16)
        pm_f, tm_f = fft_magnitude_3d(x), fft_magnitude_3d(y)
        m_f = high_freq_mask(shape)
        full = float(jnp.sum(jnp.abs(pm_f - tm_f) * m_f))
        pm_h, tm_h = rfft_magnitude_3d(x), rfft_magnitude_3d(y)
        half = float(jnp.sum(jnp.abs(pm_h - tm_h) * high_freq_mask_half(shape)
                             * half_spectrum_multiplicity(shape)))
        assert abs(full - half) / max(abs(full), 1e-6) < 1e-5

    def test_focal_frequency_matches_torch(self, rng):
        p, t = _vols(rng)
        tp, tt = torch.from_numpy(p), torch.from_numpy(t)
        pf, tf = torch.fft.fftn(tp, dim=(-3, -2, -1)), torch.fft.fftn(tt, dim=(-3, -2, -1))
        fd = (torch.abs(pf) - torch.abs(tf)) ** 2
        norm = torch.sum(fd, dim=(-3, -2, -1), keepdim=True)
        want = torch.clamp(torch.mean((fd / (norm + 1e-8)) * fd), 0, 100).item()
        got = float(losses.focal_frequency_loss(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) / max(abs(want), 1e-6) < 1e-3

    def test_drr_reprojection_runs(self, rng):
        p, _ = _vols(rng, size=16)
        xr = rng.standard_normal((2, 2, 1, 64, 64)).astype(np.float32)
        out = float(losses.drr_reprojection_loss(jnp.asarray(p), jnp.asarray(xr), img_size=64))
        assert np.isfinite(out) and out > 0


class TestComposite:
    def test_multiscale_stage_keys(self, rng):
        p, t = _vols(rng, size=16)
        xr = rng.standard_normal((2, 2, 1, 32, 32)).astype(np.float32)
        loss = losses.MultiScaleLoss()
        d1 = loss(jnp.asarray(p), jnp.asarray(t), stage=1)
        assert set(d1) == {"total_loss", "l1_loss", "ssim_loss"}
        d2 = loss(jnp.asarray(p), jnp.asarray(t), stage=2)
        assert {"vgg_loss", "tv_loss", "freq_loss"} <= set(d2)
        d3 = loss(jnp.asarray(p), jnp.asarray(t), stage=3, input_xrays=jnp.asarray(xr))
        assert "drr_loss" in d3
        for d in (d1, d2, d3):
            assert np.isfinite(float(d["total_loss"]))

    def test_stage1_weighting(self, rng):
        p, t = _vols(rng, size=16)
        d = losses.MultiScaleLoss()(jnp.asarray(p), jnp.asarray(t), stage=1)
        want = float(d["l1_loss"]) + 0.5 * float(d["ssim_loss"])
        assert abs(float(d["total_loss"]) - want) < 1e-5

    def test_direct256_loss(self, rng):
        p, t = _vols(rng, size=16)
        loss = losses.Direct256Loss()
        d = loss(jnp.asarray(p), jnp.asarray(t))
        assert set(d) == {
            "total_loss", "l1_loss", "ssim_loss", "focal_freq_loss",
            "perceptual_pyramid_loss", "tv_loss", "style_loss", "anatomical_loss",
        }
        want = (1.0 * float(d["l1_loss"]) + 0.5 * float(d["ssim_loss"]) + 0.2 * float(d["focal_freq_loss"])
                + 0.15 * float(d["perceptual_pyramid_loss"]) + 0.02 * float(d["tv_loss"])
                + 0.1 * float(d["style_loss"]) + 0.3 * float(d["anatomical_loss"]))
        assert abs(float(d["total_loss"]) - want) < 1e-4

    def test_diagnostics_suite(self, rng):
        p, t = _vols(rng, size=16)
        x0p, x0t = _vols(rng, size=16)
        xr = rng.standard_normal((2, 2, 1, 32, 32)).astype(np.float32)
        diag = losses.DiagnosticLosses(use_lpips=False)
        out = diag(
            jnp.asarray(p), jnp.asarray(t), jnp.asarray(x0p), jnp.asarray(x0t), jnp.asarray(xr),
            depth_prior=jnp.asarray(x0t) * 0.5,
            prev_stage_volume=jnp.asarray(x0t[:, :, ::2, ::2, ::2]),
        )
        assert "total" in out and np.isfinite(float(out["total"]))
        health = losses.analyze_component_health(out)
        assert "denoising" in health and "physics" in health

    def test_feature_metrics(self, rng):
        p, t = _vols(rng, size=16)
        fm = losses.ComprehensiveFeatureMetrics(compute_lpips=True, num_lpips_slices=4)
        out = fm(jnp.asarray(p), jnp.asarray(t))
        assert "overall_feature_mse" in out and "lpips_average" in out
        same = fm(jnp.asarray(p), jnp.asarray(p))
        assert float(same["overall_feature_mse"]) < 1e-10
        assert float(same["lpips_average"]) < 1e-8
