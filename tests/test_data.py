"""Data pipeline tests: synthetic phantoms, folder discovery, normalization
presets, splits, loader sharding."""

import numpy as np
import pytest

from hybrid_vit_cascade_tpu import data


class TestSynthetic:
    def test_phantom_deterministic(self):
        a = data.make_phantom_volume(32, seed=3)
        b = data.make_phantom_volume(32, seed=3)
        np.testing.assert_array_equal(a, b)
        assert a.min() < -500 and a.max() > 300  # air + bone present

    def test_dataset_item_schema(self):
        ds = data.SyntheticCTDataset(num_patients=2, volume_size=(16, 16, 16), xray_size=64)
        item = ds[0]
        assert item["ct_volume"].shape == (1, 16, 16, 16)
        assert item["drr_stacked"].shape == (2, 1, 64, 64)
        assert item["ct_volume"].min() >= -1.0 and item["ct_volume"].max() <= 1.0


class TestPatientDataset:
    @pytest.fixture
    def patient_dir(self, tmp_path):
        for pid in ["pat_a", "pat_b"]:
            d = tmp_path / pid
            d.mkdir()
            np.save(d / f"{pid}_pa_drr.npy", np.random.rand(40, 40).astype(np.float32))
            np.save(d / f"{pid}_lat_drr.npy", np.random.rand(40, 40).astype(np.float32))
            np.save(d / f"{pid}.npy", (np.random.rand(24, 24, 24) * 1000 - 500).astype(np.float32))
        # incomplete folder must be skipped
        (tmp_path / "broken").mkdir()
        np.save(tmp_path / "broken" / "broken_pa_drr.npy", np.zeros((4, 4), np.float32))
        return tmp_path

    def test_discovery_and_item(self, patient_dir):
        ds = data.PatientDRRDataset(
            str(patient_dir), target_xray_size=32, target_volume_size=(16, 16, 16)
        )
        assert len(ds) == 2
        item = ds[0]
        assert item["ct_volume"].shape == (1, 16, 16, 16)
        assert item["drr_stacked"].shape == (2, 1, 32, 32)
        assert -1.0 <= item["ct_volume"].min() and item["ct_volume"].max() <= 1.0

    def test_normalization_presets(self, patient_dir):
        soft = data.PatientDRRDataset(str(patient_dir), target_xray_size=32,
                                      target_volume_size=(16, 16, 16), normalization="soft_tissue")
        full = data.PatientDRRDataset(str(patient_dir), target_xray_size=32,
                                      target_volume_size=(16, 16, 16), normalization="full")
        v_soft = soft[0]["ct_volume"]
        v_full = full[0]["ct_volume"]
        assert v_soft.min() >= -1.0 and v_soft.max() <= 1.0
        assert v_full.min() >= 0.0 and v_full.max() <= 1.0

    def test_empty_raises(self, tmp_path):
        with pytest.raises(ValueError):
            data.PatientDRRDataset(str(tmp_path / "nope"))

    def test_splits_are_seeded(self, patient_dir):
        ds = data.PatientDRRDataset(str(patient_dir), target_xray_size=32, target_volume_size=(16, 16, 16))
        tr1, va1, te1 = data.create_train_val_datasets(ds, train_split=0.5, val_split=0.5, seed=7)
        tr2, va2, te2 = data.create_train_val_datasets(ds, train_split=0.5, val_split=0.5, seed=7)
        assert tr1.indices == tr2.indices and va1.indices == va2.indices

    def test_sorted_fraction_split(self, patient_dir):
        """dataset_simple.py:62-73 semantics: contiguous slices of the sorted
        patient order — train = [:int(n·tr)], val next, test the rest."""
        ds = data.PatientDRRDataset(str(patient_dir), target_xray_size=32, target_volume_size=(16, 16, 16))
        tr, va, te = data.create_train_val_datasets(
            ds, train_split=0.5, val_split=0.5, split_mode="sorted_fraction")
        assert list(tr.indices) == [0] and list(va.indices) == [1] and len(te) == 0
        assert tr[0]["patient_id"] == "pat_a" and va[0]["patient_id"] == "pat_b"
        with pytest.raises(ValueError):
            data.create_train_val_datasets(ds, split_mode="nope")


class TestLoader:
    def test_batching_and_epoch_shuffle(self):
        ds = data.SyntheticCTDataset(num_patients=8, volume_size=(8, 8, 8), xray_size=16)
        dl = data.DataLoader(ds, batch_size=4, seed=1, process_count=1, process_index=0)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0]["ct_volume"].shape == (4, 1, 8, 8, 8)
        ids_e0 = [i for b in batches for i in b["patient_id"]]
        dl.set_epoch(1)
        ids_e1 = [i for b in dl for i in b["patient_id"]]
        assert set(ids_e0) == set(ids_e1)
        assert ids_e0 != ids_e1  # epoch reshuffle

    def test_loader_transform_runs_in_prefetch(self):
        """The transform hook maps every batch (prefetching and not), e.g.
        the trainer's host-side stage-resolution pre-resize."""
        from hybrid_vit_cascade_tpu.training.trainer import host_target_transform

        ds = data.SyntheticCTDataset(num_patients=4, volume_size=(16, 16, 16), xray_size=16)
        tf = host_target_transform((8, 8, 8), cache=True)
        for prefetch in (0, 2):
            dl = data.DataLoader(ds, batch_size=2, shuffle=False, num_prefetch=prefetch,
                                 process_count=1, process_index=0, transform=tf)
            batches = list(dl)
            assert all(b["ct_volume"].shape == (2, 1, 8, 8, 8) for b in batches)
            # X-rays untouched
            assert batches[0]["drr_stacked"].shape[-1] == 16

    def test_host_resize_matches_device_resize(self):
        """resize_trilinear_np (host pre-resize) must agree with the on-device
        resize_target path it replaces — same interpolation matrices."""
        import jax.numpy as jnp

        from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear, resize_trilinear_np

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 12, 10, 8)).astype(np.float32)
        host = resize_trilinear_np(x, (6, 5, 4))
        dev = np.asarray(resize_trilinear(jnp.asarray(x), (6, 5, 4), align_corners=False))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)

    def test_transform_native_resample_matches_numpy(self):
        """host_target_transform routes through the threaded C++ resample
        when the .so is available; its output must be fp32-identical (~1e-6)
        to the numpy-matrix path on arbitrary (B, C, D, H, W) batches."""
        from hybrid_vit_cascade_tpu.data import native_io
        from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear_np
        from hybrid_vit_cascade_tpu.training.trainer import host_target_transform

        if not native_io.available():
            import pytest

            pytest.skip("native .so not built")
        rng = np.random.default_rng(1)
        v = rng.standard_normal((3, 1, 16, 12, 10)).astype(np.float32)
        got = host_target_transform((8, 6, 5))({"ct_volume": v})["ct_volume"]
        want = resize_trilinear_np(v, (8, 6, 5), align_corners=False)
        assert got.shape == (3, 1, 8, 6, 5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_process_sharding_partitions(self):
        ds = data.SyntheticCTDataset(num_patients=8, volume_size=(8, 8, 8), xray_size=16)
        seen = []
        for rank in range(2):
            dl = data.DataLoader(ds, batch_size=2, shuffle=False, process_count=2, process_index=rank,
                                 num_prefetch=0)
            seen += [i for b in dl for i in b["patient_id"]]
        assert sorted(seen) == sorted(x["patient_id"] for x in (ds[i] for i in range(8)))


@pytest.mark.slow
class TestReferenceTreeRehearsal:
    def test_reference_tree_discovery_decode_batch(self, tmp_path):
        """Dress rehearsal of the REAL data contract (utils/dataset.py:
        94-159, 199-229): write_reference_tree materializes phantoms as
        `<pid>/{<pid>_pa_drr.png, <pid>_lat_drr.png, <pid>.nii.gz}` and the
        full pipeline — folder discovery → NIfTI (gzip) decode (native C++
        when built, pure-Python fallback otherwise) → HU soft-tissue window
        → host resize → seeded split → prefetched batches — runs on it."""
        from hybrid_vit_cascade_tpu.data import (DataLoader, PatientDRRDataset,
                                                 create_train_val_datasets, native_io)
        from hybrid_vit_cascade_tpu.data.synthetic import (make_phantom_volume,
                                                           render_drr_pair,
                                                           window_volume,
                                                           write_reference_tree)

        pids = write_reference_tree(tmp_path, num_patients=4, base_size=48, xray_size=64)
        assert pids == [f"patient{i:03d}" for i in range(4)]

        ds = PatientDRRDataset(str(tmp_path), target_xray_size=64,
                               target_volume_size=(32, 32, 32),
                               normalization="soft_tissue", validate_alignment=True)
        assert len(ds) == 4
        item = ds[0]
        # volume decoded + windowed to [-1, 1]; DRRs follow the preset's
        # normalize_range too ([-1, 1] for soft_tissue — dataset.py:118-121)
        assert item["ct_volume"].shape == (1, 32, 32, 32)
        assert -1.0 <= item["ct_volume"].min() and item["ct_volume"].max() <= 1.0
        assert item["ct_volume"].max() > 0.5, "bone should saturate the window"
        assert item["drr_stacked"].shape == (2, 1, 64, 64)
        assert -1.0 <= item["drr_stacked"].min() and item["drr_stacked"].max() <= 1.0
        assert item["drr_stacked"].min() < -0.5, "air background maps to the range floor" 
        # the on-disk round trip must reproduce the in-memory phantom: decode
        # + window + resize vs direct generation (PNG 8-bit quantization and
        # resize are the only differences)
        hu = make_phantom_volume(48, seed=0)
        from hybrid_vit_cascade_tpu.ops.resize import resize_trilinear_np

        # the real path resizes in HU then windows (utils/dataset.py:219-229)
        want = window_volume(resize_trilinear_np(hu, (32, 32, 32)), "soft_tissue")
        np.testing.assert_allclose(item["ct_volume"][0], want, atol=2e-3)
        drr_want = render_drr_pair(window_volume(hu, "soft_tissue"), 64) * 2.0 - 1.0
        np.testing.assert_allclose(item["drr_stacked"], drr_want, atol=2 * 2.0 / 255.0)
        # alignment validation ran (max-projection MSE, utils/dataset.py:233-283)
        assert ds.alignment_stats["total"] >= 1

        # seeded split + prefetched loader over the tree
        tr, va, te = create_train_val_datasets(ds, 0.5, 0.25, seed=42)
        assert len(tr) + len(va) + len(te) == 4
        batches = list(DataLoader(tr, batch_size=2, shuffle=True, seed=0, num_prefetch=1))
        assert batches and batches[0]["ct_volume"].shape == (2, 1, 32, 32, 32)

    def test_reference_tree_native_decode_matches_python(self, tmp_path):
        """The C++ NIfTI decode must agree with the pure-Python codec on the
        rehearsal tree's gzipped files."""
        from hybrid_vit_cascade_tpu.data import native_io
        from hybrid_vit_cascade_tpu.data.nifti import read_nifti
        from hybrid_vit_cascade_tpu.data.synthetic import write_reference_tree

        if not native_io.available():
            pytest.skip("native .so not built")
        write_reference_tree(tmp_path, num_patients=1, base_size=32, xray_size=32)
        p = str(tmp_path / "patient000" / "patient000.nii.gz")
        nat = native_io.read_nifti(p)
        assert nat is not None
        np.testing.assert_allclose(nat, read_nifti(p), atol=0)
