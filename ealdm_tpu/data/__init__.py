"""Data layer: host ETL, datasets, loaders, scalers, synthetic corpus."""

from .images import ImageFolderDataset, ImageSRDataset, degrade_sr_light
from .pipeline import DataLoader, DataModule, Dataset, DevicePrefetcher, WrappedDataset
from .scalers import (
    MinMaxScaler,
    MultiLabelBinarizer,
    StandardScaler,
    load_scaler,
    save_scaler,
)
from .stdiff import (
    ImageNetVidDataset,
    StreamCameraDataset,
    WEATHER_CLASSES,
    parse_response_jsonl,
)
from .synthetic import generate_synthetic_dataset

__all__ = [
    "DataLoader",
    "DataModule",
    "Dataset",
    "DevicePrefetcher",
    "WrappedDataset",
    "ImageFolderDataset",
    "ImageSRDataset",
    "degrade_sr_light",
    "StandardScaler",
    "MinMaxScaler",
    "MultiLabelBinarizer",
    "save_scaler",
    "load_scaler",
    "StreamCameraDataset",
    "ImageNetVidDataset",
    "WEATHER_CLASSES",
    "parse_response_jsonl",
    "generate_synthetic_dataset",
]
