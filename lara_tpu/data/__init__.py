"""Datasets (counterpart of dataLoader/__init__.py's `dataset_dict`)."""

from lara_tpu.data.gobjverse import GObjaverseDataset
from lara_tpu.data.gso import GSODataset
from lara_tpu.data.instant3d import Instant3DDataset
from lara_tpu.data.loader import DataLoader
from lara_tpu.data.mipnerf import MipNeRF360Dataset
from lara_tpu.data.mvgen import MVGenDataset
from lara_tpu.data.synthetic import SyntheticDataset, write_synthetic_h5

# mirrors dataLoader/__init__.py:7-12 (incl. the reference's spelling)
dataset_dict = {
    "gobjeverse": GObjaverseDataset,
    "gobjaverse": GObjaverseDataset,
    "GSO": GSODataset,
    "instant3d": Instant3DDataset,
    "mipnerf360": MipNeRF360Dataset,
    "mvgen": MVGenDataset,
    "synthetic": SyntheticDataset,
}

__all__ = ["dataset_dict", "DataLoader", "GObjaverseDataset", "GSODataset",
           "Instant3DDataset", "MipNeRF360Dataset", "MVGenDataset",
           "SyntheticDataset", "write_synthetic_h5"]
