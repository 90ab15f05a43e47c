"""Registry semantics: duplicate guard, overwrite escape hatch, and the
dataset-info registration path (reference utils/registry.py:12-73)."""
import pytest

from basedet_tpu.utils.registry import Registry


def test_duplicate_registration_raises():
    reg = Registry("t")
    reg.register(1, name="a")
    with pytest.raises(KeyError):
        reg.register(2, name="a")
    reg.register(1, name="a")  # same object is idempotent


def test_overwrite_flag():
    reg = Registry("t")
    reg.register(1, name="a")
    reg.register(2, name="a", overwrite=True)
    assert reg.get("a") == 2


def test_register_dataset_idempotent(tmp_path):
    from basedet_tpu.data.datasets.info import register_dataset, resolve_dataset

    register_dataset("reg_test_ds", str(tmp_path / "im"), str(tmp_path / "a.json"))
    register_dataset("reg_test_ds", str(tmp_path / "im2"), str(tmp_path / "a.json"))
    imgs, _ = resolve_dataset("reg_test_ds")
    assert imgs.endswith("im2")
