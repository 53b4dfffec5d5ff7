from cadepth_tpu.data.manifest import (
    ValidationResult,
    SunRGBDValidator,
    save_manifest,
    load_manifest,
)
from cadepth_tpu.data.sunrgbd import AugmentationConfig, SunRGBDLoader
from cadepth_tpu.data.synthetic import generate_synthetic_dataset
from cadepth_tpu.data.pipeline import InputPipeline
from cadepth_tpu.data.packed import PackedSunRGBDLoader, pack_dataset
from cadepth_tpu.data.device_resident import (
    ChunkedDeviceDataset,
    DeviceDataset,
    DevicePipeline,
)

__all__ = [
    "ChunkedDeviceDataset",
    "DeviceDataset",
    "DevicePipeline",
    "PackedSunRGBDLoader",
    "pack_dataset",
    "ValidationResult",
    "SunRGBDValidator",
    "save_manifest",
    "load_manifest",
    "AugmentationConfig",
    "SunRGBDLoader",
    "generate_synthetic_dataset",
    "InputPipeline",
]
