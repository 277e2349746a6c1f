"""L0 data pipeline: host-side NIfTI/PNG reading, HU normalization, sharded
prefetch to device. Replaces the reference's two incompatible
`PatientDRRDataset`s (utils/dataset.py vs dataset_simple.py) with one dataset
and two explicit normalization presets."""

from .dataset import PatientDRRDataset, create_train_val_datasets, NORMALIZATION_PRESETS
from .nifti import read_nifti, write_nifti
from .pipeline import DataLoader, shard_batch
from .synthetic import SyntheticCTDataset, make_phantom_volume, render_drr_pair

__all__ = [
    "read_nifti",
    "write_nifti",
    "PatientDRRDataset",
    "create_train_val_datasets",
    "NORMALIZATION_PRESETS",
    "DataLoader",
    "shard_batch",
    "SyntheticCTDataset",
    "make_phantom_volume",
    "render_drr_pair",
]
