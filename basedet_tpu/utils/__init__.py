from .config_dict import ConfigDict
from .logger import logger, setup_logger
from .meters import AverageMeter, MeterBuffer
from .registry import Registry, all_register, registers

__all__ = [
    "AverageMeter",
    "ConfigDict",
    "MeterBuffer",
    "Registry",
    "all_register",
    "logger",
    "registers",
    "setup_logger",
]
