"""Activation parity harness (tools/parity_diff.py): self-dump must diff
clean; a perturbed stage must be flagged as the first divergence; reference
NCHW layout and container outputs must normalize."""
import numpy as np
import pytest

from basedet_tpu.tools.parity_diff import (
    canonical_name,
    diff_dumps,
    dump_activations,
)


@pytest.fixture(scope="module")
def tiny_dump():
    import jax

    from basedet_tpu.configs import RetinaNetConfig
    from basedet_tpu.utils import all_register

    all_register()
    cfg = RetinaNetConfig()
    cfg.MODEL.BACKBONE.NAME = "resnet18"
    cfg.DATA.NUM_CLASSES = 3
    model = cfg.build_model()
    variables = model.init_variables(jax.random.PRNGKey(0), image_size=(64, 64))
    img = np.random.RandomState(0).randint(0, 256, (1, 64, 64, 3)).astype(
        np.float32
    )
    acts = dump_activations(model, variables, img)
    return {k: np.asarray(v) for k, v in acts.items()}


def test_dump_has_canonical_seams(tiny_dump):
    keys = set(tiny_dump)
    # trunk stage dict keys surface directly (RetinaNet OUT_FEATURES res3..5)
    assert {"res3", "res4", "res5"} <= keys
    assert {"p3", "p4", "p5", "p6", "p7"} <= keys
    assert {"head.0.0", "head.1.4"} <= keys  # per-level cls/bbox maps
    assert "head/cls_score" in keys


def test_self_diff_clean(tiny_dump):
    rows, ok = diff_dumps(tiny_dump, dict(tiny_dump))
    assert ok
    assert all(r["status"] == "OK" for r in rows)
    assert all(r["max_abs"] == 0.0 for r in rows)


def test_perturbed_stage_flagged(tiny_dump):
    ref = {k: v.copy() for k, v in tiny_dump.items()}
    ref["res4"] = ref["res4"] + 0.01
    order = ["res3", "res4", "res5"]
    rows, ok = diff_dumps(tiny_dump, ref, order=order)
    assert not ok
    bad = [r for r in rows if r["status"] == "DIVERGED"]
    assert [r["stage"] for r in bad] == ["res4"]
    assert bad[0]["max_abs"] == pytest.approx(0.01, rel=1e-3)
    # ordered report puts trunk stages first
    assert [r["stage"] for r in rows[:3]] == order


def test_nchw_reference_auto_transposed(tiny_dump):
    ref = {k: np.transpose(v, (0, 3, 1, 2)) if v.ndim == 4 else v
           for k, v in tiny_dump.items()}
    rows, ok = diff_dumps(tiny_dump, ref)
    assert ok


def test_one_sided_keys_reported(tiny_dump):
    ref = dict(tiny_dump)
    ref["ref_extra_seam"] = np.zeros((2, 2), np.float32)
    ours = dict(tiny_dump)
    del ours["res3"]
    rows, ok = diff_dumps(ours, ref)
    statuses = {r["stage"]: r["status"] for r in rows}
    assert statuses["ref_extra_seam"] == "REF-ONLY"
    assert statuses["res3"] == "REF-ONLY"
    assert ok  # one-sided keys warn, they don't fail parity


def test_canonical_name():
    assert canonical_name("backbone/bottom_up/layer1_0/__call__") == "layer1_0"
    assert canonical_name("head/cls_score/__call__") == "head/cls_score"
    assert canonical_name("__call__") == "output"


def test_container_flatten_nested():
    from basedet_tpu.tools.parity_diff import _flatten_containers

    flat = _flatten_containers({
        "bottom_up/__call__": {"res2": np.ones((1, 2, 2, 3))},
        "fpn/__call__": [np.zeros((1, 2)), np.ones((1, 2))],
    })
    assert set(flat) == {"res2", "fpn.0", "fpn.1"}


def test_diff_cli_warns_on_same_device(tmp_path, capsys):
    """A cross-backend diff where both dumps came off the same chip is
    vacuous (this bit a real run: the env's site hook re-registers the TPU
    plugin, so JAX_PLATFORMS=cpu alone did NOT move the dump to the host
    and the 'CPU' side silently ran on TPU — all-zero diffs)."""
    import pickle

    from basedet_tpu.tools.parity_diff import main

    payload = {
        "activations": {"res3": np.ones((1, 2, 2, 3), np.float32)},
        "input": np.zeros((1, 4, 4, 3), np.float32),
        "meta": {"backend": "tpu", "device": "TPU_0(process=0,(0,0,0,0))"},
    }
    a, b = tmp_path / "a.pkl", tmp_path / "b.pkl"
    for path in (a, b):
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    main(["diff", str(a), str(b)])
    out = capsys.readouterr().out
    assert "SAME device" in out
    assert "PARITY OK" in out  # identical payloads still diff clean


def test_dump_cli_records_backend(tmp_path):
    """dump --backend cpu must pin the backend post-import (env vars are
    not authoritative here) and record backend+device in the meta block."""
    import pickle

    from basedet_tpu.tools.parity_diff import main

    out = tmp_path / "dump.pkl"
    main([
        "dump", "--size", "64", "--backend", "cpu", "-o", str(out),
        "MODEL.BACKBONE.NAME", "resnet18", "DATA.NUM_CLASSES", "3",
    ])
    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["meta"]["backend"] == "cpu"
    assert "cpu" in payload["meta"]["device"].lower()
    assert payload["activations"]
