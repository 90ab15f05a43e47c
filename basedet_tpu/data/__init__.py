from .build import DataloaderBuilder, build_test_dataloader
from .transforms import centernet_transform  # noqa: F401
from .transforms import yolox_transform  # noqa: F401
from .transforms.transforms import TransformCompose, build_transforms

__all__ = ["DataloaderBuilder", "TransformCompose", "build_test_dataloader", "build_transforms"]
