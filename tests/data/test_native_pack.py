"""Native (C++) batch-pack op vs the pure-numpy reference, and the uint8
end-to-end path through collator + model pre_process."""
import numpy as np
import pytest

from basedet_tpu.native.build import load
from basedet_tpu.native.pack import CanvasRing, _pack_numpy, pack_images


def _records(rng, n=4, dtype=np.uint8):
    recs = []
    for _ in range(n):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        recs.append(
            dict(
                image=rng.integers(0, 255, (h, w, 3)).astype(dtype),
                boxes=np.asarray([[1.0, 2.0, 20.0, 30.0]], np.float32),
                labels=np.asarray([3], np.int32),
            )
        )
    return recs


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
@pytest.mark.parametrize("with_mask", [False, True])
def test_pack_matches_numpy(dtype, with_mask):
    rng = np.random.default_rng(0)
    imgs = [r["image"] for r in _records(rng, 6, dtype)]
    pad = 114 if dtype == np.uint8 else 0.5
    out, mask = pack_images(imgs, 128, 128, pad, with_mask=with_mask,
                            ring=CanvasRing())
    ref, rmask = _pack_numpy(imgs, 128, 128, pad, np.dtype(dtype), with_mask)
    assert out.dtype == np.dtype(dtype)
    assert np.array_equal(out, ref)
    if with_mask:
        assert mask.dtype == np.uint8 and np.array_equal(mask, rmask)


def test_native_lib_builds():
    lib = load()
    assert lib is not None, "g++ toolchain present but native lib failed"
    assert lib.native_num_threads() >= 1


def test_float_pad_value_demotes_uint8_to_f32():
    rng = np.random.default_rng(1)
    imgs = [r["image"] for r in _records(rng, 2, np.uint8)]
    out, _ = pack_images(imgs, 128, 128, pad=0.5)
    assert out.dtype == np.float32


def test_collator_preserves_uint8_and_model_casts():
    import jax

    from basedet_tpu.data.collators.pad_collator import DetectionPadCollator
    from basedet_tpu import configs as C

    rng = np.random.default_rng(2)
    recs = _records(rng, 2, np.uint8)
    batch = DetectionPadCollator(max_instances=8)(recs)
    assert batch["data"].dtype == np.uint8

    cfg = C.RetinaNetConfig()
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    model = cfg.build_model()
    inputs = model.pre_process(batch, train=True)
    assert inputs["image"].dtype == np.float32
    variables = model.init_variables(
        jax.random.PRNGKey(0), image_size=batch["data"].shape[1:3]
    )
    total, losses, _ = model.get_losses(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
