from pfann_tpu.utils.config import (
    Timing,
    get_hash,
    read_config,
    read_file_list,
)
from pfann_tpu.utils.logging import MultiProcessInitLogger, get_logger, init_logger

__all__ = [
    "Timing",
    "get_hash",
    "read_config",
    "read_file_list",
    "MultiProcessInitLogger",
    "get_logger",
    "init_logger",
]
