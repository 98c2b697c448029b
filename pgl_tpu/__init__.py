"""pgl_tpu — a TPU-native graph learning framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of
PaddlePaddle/PGL (reference mounted at /root/reference): send/recv message
passing, CSR/CSC graphs with segment-reduce aggregation, a conv-layer zoo,
heterogeneous/bipartite graphs, sampling/walks, partitioning, and
edge-partitioned multi-chip training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .graph import Graph
from .message import Message
from . import math
from . import ops
from . import nn
from . import utils

__all__ = ["Graph", "Message", "math", "ops", "nn", "utils"]
