"""NIfTI codecs: pure-Python writer/reader roundtrip, native C++ reader
parity, threaded resample vs torch golden. (nibabel is not available in this
environment; our own writer generates the fixtures.)"""

import gzip
import struct

import numpy as np
import pytest

from hybrid_vit_cascade_tpu.data import native_io
from hybrid_vit_cascade_tpu.data.nifti import read_nifti, write_nifti


class TestPurePythonCodec:
    @pytest.mark.parametrize("compressed", [False, True])
    def test_write_read_roundtrip(self, tmp_path, rng, compressed):
        vol = rng.standard_normal((9, 7, 5)).astype(np.float32)
        path = tmp_path / ("v.nii.gz" if compressed else "v.nii")
        write_nifti(path, vol)
        got = read_nifti(path)
        np.testing.assert_allclose(got, vol, rtol=1e-6, atol=1e-6)

    def test_scl_slope_applied(self, tmp_path, rng):
        # hand-craft an int16 file with slope/inter
        data = rng.integers(-500, 500, size=(4, 3, 2)).astype(np.int16)
        hdr = bytearray(348)
        struct.pack_into("<i", hdr, 0, 348)
        struct.pack_into("<8h", hdr, 40, 3, 4, 3, 2, 1, 1, 1, 1)
        struct.pack_into("<2h", hdr, 70, 4, 16)  # int16
        struct.pack_into("<f", hdr, 108, 352.0)
        struct.pack_into("<2f", hdr, 112, 2.0, -10.0)  # slope, inter
        hdr[344:348] = b"n+1\x00"
        payload = bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F")
        path = tmp_path / "s.nii.gz"
        path.write_bytes(gzip.compress(payload))

        want = data.astype(np.float32) * 2.0 - 10.0
        got = read_nifti(path)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
        if native_io.available():
            got_native = native_io.read_nifti(str(path))
            np.testing.assert_allclose(got_native, want, rtol=1e-6, atol=1e-5)


@pytest.mark.skipif(not native_io.available(), reason="libnifti_io.so not built")
class TestNativeReader:
    @pytest.mark.parametrize("compressed", [False, True])
    def test_matches_pure_python(self, tmp_path, rng, compressed):
        vol = (rng.standard_normal((11, 6, 8)) * 300).astype(np.float32)
        path = tmp_path / ("v.nii.gz" if compressed else "v.nii")
        write_nifti(path, vol)
        got = native_io.read_nifti(str(path))
        assert got is not None
        np.testing.assert_allclose(got, read_nifti(path), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got, vol, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not native_io.available(), reason="libnifti_io.so not built")
class TestResample:
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch(self, rng, align_corners):
        import torch
        import torch.nn.functional as F

        vol = rng.standard_normal((12, 15, 9)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(vol)[None, None], size=(20, 8, 17), mode="trilinear",
            align_corners=align_corners,
        )[0, 0].numpy()
        got = native_io.resample_trilinear(vol, (20, 8, 17), align_corners=align_corners)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_threaded_matches_single(self, rng):
        vol = rng.standard_normal((32, 20, 16)).astype(np.float32)
        a = native_io.resample_trilinear(vol, (48, 24, 40), num_threads=1)
        b = native_io.resample_trilinear(vol, (48, 24, 40), num_threads=8)
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native_io.available(), reason="libnifti_io.so not built")
class TestWindowNormalize:
    def test_soft_tissue_window(self, rng):
        vol = (rng.standard_normal((8, 8, 8)) * 500).astype(np.float32)
        got = native_io.window_normalize(vol.copy(), (-200.0, 200.0), (-1.0, 1.0))
        want = (np.clip(vol, -200, 200) + 200) / 400 * 2 - 1
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
