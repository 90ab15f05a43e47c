"""Config dump CLI (reference tools/dump_cfg.py:22-309): converts a
class-style config into flat, editable python-dict source."""
from __future__ import annotations

import pprint

from basedet_tpu.utils import all_register

from .misc import default_parser, import_config

_TEMPLATE = '''"""Auto-dumped flat config (basedet_tpu dump_cfg)."""
from basedet_tpu.configs import DetectionConfig

_FLAT_CONFIG = {cfg_dict}


class Cfg(DetectionConfig):
    def __init__(self):
        super().__init__()
        self.merge(_FLAT_CONFIG)
'''


def dump_config_source(cfg) -> str:
    return _TEMPLATE.format(cfg_dict=pprint.pformat(cfg.to_dict(), width=88))


def main(args=None):
    parser = default_parser("basedet_tpu dump_cfg")
    parser.add_argument("--out", type=str, default="dumped_config.py")
    args = parser.parse_args(args)
    all_register()
    cfg = import_config(args.file)
    source = dump_config_source(cfg)
    with open(args.out, "w") as f:
        f.write(source)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
