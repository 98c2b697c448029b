from . import edge_index
from .logger import log

__all__ = ["edge_index", "log"]
