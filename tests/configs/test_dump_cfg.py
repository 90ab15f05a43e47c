"""dump_cfg fidelity: dict(...)-style source, method carry-over, round-trip
(reference tools/dump_cfg.py:22-309 semantics)."""
import os
import textwrap

from basedet_tpu.tools.dump_cfg import (
    check_round_trip,
    dump_config_source,
)
from basedet_tpu.tools.misc import import_config


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_round_trip_simple(tmp_path):
    src = _write(
        tmp_path, "config.py", """
        from basedet_tpu.configs import RetinaNetConfig

        class Cfg(RetinaNetConfig):
            def __init__(self):
                super().__init__()
                self.merge(dict(MODEL=dict(BATCHSIZE=4),
                                SOLVER=dict(MAX_EPOCH=7, BASIC_LR=float('inf'))))
        """,
    )
    cfg = import_config(src)
    out = str(tmp_path / "dumped.py")
    with open(out, "w") as f:
        f.write(dump_config_source(cfg))
    check_round_trip(cfg, out)  # asserts on mismatch
    text = open(out).read()
    assert "dict(" in text and "float('inf')" in text
    new_cfg = import_config(out)
    assert new_cfg.MODEL.BATCHSIZE == 4
    assert new_cfg.SOLVER.MAX_EPOCH == 7


def test_methods_carried_over(tmp_path):
    src = _write(
        tmp_path, "config.py", """
        from basedet_tpu.configs import RetinaNetConfig

        class Cfg(RetinaNetConfig):
            def __init__(self):
                super().__init__()
                self.MODEL.BATCHSIZE = 3

            def custom_helper(self):
                return self.MODEL.BATCHSIZE * 10
        """,
    )
    cfg = import_config(src)
    out = str(tmp_path / "dumped.py")
    with open(out, "w") as f:
        f.write(dump_config_source(cfg))
    new_cfg = import_config(out)
    assert new_cfg.custom_helper() == 30
