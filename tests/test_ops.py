"""Golden tests for L1 ops against torch-CPU reference formulas.

torch here is the oracle only (the shipped framework has no torch dependency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hybrid_vit_cascade_tpu import ops


def _np(x):
    return np.asarray(x, dtype=np.float32)


class TestResize:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("in_size,out_size", [(16, 32), (32, 16), (13, 24), (24, 13), (7, 7)])
    def test_trilinear_matches_torch(self, rng, align_corners, in_size, out_size):
        x = rng.standard_normal((2, 1, in_size, in_size, in_size)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x), size=(out_size,) * 3, mode="trilinear", align_corners=align_corners
        ).numpy()
        got = _np(ops.resize_trilinear(jnp.asarray(x), (out_size,) * 3, align_corners=align_corners))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("align_corners", [True, False])
    def test_bilinear_matches_torch(self, rng, align_corners):
        x = rng.standard_normal((2, 3, 37, 53)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x), size=(64, 48), mode="bilinear", align_corners=align_corners
        ).numpy()
        got = _np(ops.resize_bilinear(jnp.asarray(x), (64, 48), align_corners=align_corners))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_upsample_nearest_matches_torch(self, rng):
        x = rng.standard_normal((1, 2, 8, 9, 10)).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
        got = _np(ops.upsample_nearest(jnp.asarray(x), (16, 18, 20), axes=(-3, -2, -1)))
        np.testing.assert_allclose(got, want)


class TestPool:
    def test_avg_pool3d_stride1_padded(self, rng):
        x = rng.standard_normal((2, 1, 20, 20, 20)).astype(np.float32)
        want = F.avg_pool3d(torch.from_numpy(x), 11, stride=1, padding=5).numpy()
        got = _np(ops.box_filter_same(jnp.asarray(x), 11, spatial_axes=(-3, -2, -1)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_avg_pool3d_stride_eq_kernel(self, rng):
        x = rng.standard_normal((2, 1, 32, 32, 32)).astype(np.float32)
        want = F.avg_pool3d(torch.from_numpy(x), 8, stride=8).numpy()
        got = _np(ops.avg_pool_nd(jnp.asarray(x), 8, spatial_axes=(-3, -2, -1)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_avg_pool3d_k4_s1_p2(self, rng):
        # stage-transition low-freq filter (diagnostic_losses.py:399)
        x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
        want = F.avg_pool3d(torch.from_numpy(x), 4, stride=1, padding=2).numpy()
        got = _np(ops.avg_pool_nd(jnp.asarray(x), 4, spatial_axes=(-3, -2, -1), stride=1, padding=2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_max_pool2d(self, rng):
        x = rng.standard_normal((2, 4, 33, 33)).astype(np.float32)
        want = F.max_pool2d(torch.from_numpy(x), 3, stride=2, padding=1).numpy()
        got = _np(ops.max_pool_nd(jnp.asarray(x), 3, spatial_axes=(-2, -1), stride=2, padding=1))
        np.testing.assert_allclose(got, want)


class TestDRR:
    def _torch_beer_lambert(self, vol, angle):
        att = torch.exp(-0.3 * (vol + 1.0))
        if angle == 90:
            drr = att.sum(dim=-1).transpose(1, 2)
        else:
            drr = att.sum(dim=1)
        return torch.clamp(drr, min=1e-6)

    def test_beer_lambert_ap_and_lateral(self, rng):
        x = rng.standard_normal((2, 24, 20, 16)).astype(np.float32)
        tv = torch.from_numpy(x)
        np.testing.assert_allclose(
            _np(ops.drr_beer_lambert(jnp.asarray(x), "ap")),
            self._torch_beer_lambert(tv, 0).numpy(),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            _np(ops.drr_beer_lambert(jnp.asarray(x), "lateral")),
            self._torch_beer_lambert(tv, 90).numpy(),
            rtol=1e-5, atol=1e-5,
        )

    def test_mean_projection(self, rng):
        x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
        tv = torch.from_numpy(x)
        want_ap = F.interpolate(tv.mean(dim=2), size=(64, 64), mode="bilinear", align_corners=False).numpy()
        want_lat = F.interpolate(tv.mean(dim=4), size=(64, 64), mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(
            _np(ops.drr_mean_projection(jnp.asarray(x), "ap", img_size=64)), want_ap, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            _np(ops.drr_mean_projection(jnp.asarray(x), "lateral", img_size=64)), want_lat, rtol=1e-5, atol=1e-5
        )


class TestSSIM:
    def _torch_ssim(self, pred, target, window_size=11):
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        w = min(window_size, pred.shape[2], pred.shape[3], pred.shape[4])
        mu_p = F.avg_pool3d(pred, w, stride=1, padding=w // 2)
        mu_t = F.avg_pool3d(target, w, stride=1, padding=w // 2)
        s_p = F.avg_pool3d(pred ** 2, w, stride=1, padding=w // 2) - mu_p ** 2
        s_t = F.avg_pool3d(target ** 2, w, stride=1, padding=w // 2) - mu_t ** 2
        s_pt = F.avg_pool3d(pred * target, w, stride=1, padding=w // 2) - mu_p * mu_t
        ssim = ((2 * mu_p * mu_t + C1) * (2 * s_pt + C2)) / (
            (mu_p ** 2 + mu_t ** 2 + C1) * (s_p + s_t + C2)
        )
        return ssim.mean().item()

    @pytest.mark.parametrize("size", [16, 24])
    def test_ssim_matches_torch(self, rng, size):
        p = rng.standard_normal((2, 1, size, size, size)).astype(np.float32)
        t = (p + 0.3 * rng.standard_normal(p.shape)).astype(np.float32)
        want = self._torch_ssim(torch.from_numpy(p), torch.from_numpy(t))
        got = float(ops.ssim3d(jnp.asarray(p), jnp.asarray(t)))
        assert abs(got - want) < 1e-5

    def test_ssim_identity(self, rng):
        p = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
        assert float(ops.ssim3d(jnp.asarray(p), jnp.asarray(p))) > 0.999


class TestFFT:
    def test_magnitude_matches_torch(self, rng):
        x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
        want = torch.abs(torch.fft.fftn(torch.from_numpy(x), dim=(-3, -2, -1))).numpy()
        got = _np(ops.fft_magnitude_3d(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_high_freq_mask_matches_torch(self):
        D = H = W = 16
        cd, ch, cw = D // 2, H // 2, W // 2
        radius = min(D, H, W) // 4
        d = torch.arange(D).float() - cd
        h = torch.arange(H).float() - ch
        w = torch.arange(W).float() - cw
        dd, hh, ww = torch.meshgrid(d, h, w, indexing="ij")
        want = (torch.sqrt(dd ** 2 + hh ** 2 + ww ** 2) > radius).float().numpy()
        got = _np(ops.high_freq_mask((D, H, W)))
        np.testing.assert_array_equal(got, want)


class TestGeluFast:
    """ops/activations.py: polynomial-erf GELU fast path for half precision.

    Parity contract: torch nn.GELU() is the erf form (vit_components.py:93);
    the poly path must match it to within one bf16 ulp (it only ever runs on
    bf16/fp16 tensors — fp32 keeps XLA's exact rational erf bit-for-bit)."""

    def test_fp32_is_exact_gelu(self, rng):
        from hybrid_vit_cascade_tpu.ops.activations import gelu_erf

        x = jnp.asarray(rng.standard_normal(4096).astype(np.float32)) * 3
        np.testing.assert_array_equal(
            _np(gelu_erf(x)), _np(jax.nn.gelu(x, approximate=False)))

    def test_bf16_within_one_ulp_of_torch(self):
        from hybrid_vit_cascade_tpu.ops.activations import gelu_erf

        # oracle on the SAME bf16-quantized inputs (input rounding dominates
        # the poly's 1.5e-7 erf error otherwise)
        xq = jnp.asarray(np.linspace(-8, 8, 4097, dtype=np.float32)).astype(jnp.bfloat16)
        xs = _np(xq).astype(np.float32)
        want = torch.nn.functional.gelu(torch.from_numpy(xs)).numpy()
        got = _np(gelu_erf(xq)).astype(np.float32)
        want_bf16 = _np(jnp.asarray(want).astype(jnp.bfloat16)).astype(np.float32)
        ulp = np.maximum(np.abs(want_bf16) * 2.0 ** -8, 2.0 ** -14)
        assert np.all(np.abs(got - want_bf16) <= ulp + 5e-7)

    def test_bf16_grad_matches_exact(self, rng):
        from hybrid_vit_cascade_tpu.ops.activations import gelu_erf

        x = jnp.asarray(rng.standard_normal(2048).astype(np.float32) * 2)
        g_poly = jax.grad(lambda v: gelu_erf(v.astype(jnp.bfloat16)).astype(jnp.float32).sum())(x)
        g_ref = jax.grad(lambda v: jax.nn.gelu(v, approximate=False).sum())(x)
        np.testing.assert_allclose(_np(g_poly), _np(g_ref), atol=8e-3)
