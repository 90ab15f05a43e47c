from .base_net import BaseNet
from .det import *  # noqa: F401,F403

__all__ = ["BaseNet"]
