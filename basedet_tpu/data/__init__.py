from .build import DataloaderBuilder, build_test_dataloader

__all__ = ["DataloaderBuilder", "build_test_dataloader"]
