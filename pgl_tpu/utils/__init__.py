from . import edge_index
from . import transform
from . import config
from . import data
from .logger import log

__all__ = ["edge_index", "transform", "config", "data", "log"]
