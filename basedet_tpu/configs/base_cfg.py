"""Base config class.

Capability analogue of /root/reference/basedet/configs/base_cfg.py:11-34
(ConfigDict subclass + log-dir linking).
"""
from __future__ import annotations

import os

from basedet_tpu.utils import ConfigDict


class BaseConfig(ConfigDict):
    def link_log_dir(self, link_name: str = "log") -> None:
        """Symlink the output dir next to the working dir (reference
        base_cfg.py:22-34)."""
        output_dir = self.GLOBAL.OUTPUT_DIR
        os.makedirs(output_dir, exist_ok=True)
        if os.path.islink(link_name):
            os.remove(link_name)
        if not os.path.exists(link_name):
            try:
                os.symlink(os.path.abspath(output_dir), link_name)
            except OSError:
                pass
