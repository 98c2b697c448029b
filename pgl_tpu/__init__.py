"""pgl_tpu — a TPU-native graph learning framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of
PaddlePaddle/PGL (reference mounted at /root/reference): send/recv message
passing, CSR/CSC graphs with segment-reduce aggregation, a conv-layer zoo,
heterogeneous/bipartite graphs, sampling/walks, partitioning, and
edge-partitioned multi-chip training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .graph import Graph
from .bigraph import BiGraph
from .heter_graph import HeterGraph
from .message import Message
from . import math
from . import ops
from . import nn
from . import utils
from . import sampling
from . import datasets
from . import models
from . import parallel
from . import partition
from . import native

__all__ = ["Graph", "BiGraph", "HeterGraph", "Message", "math", "ops",
           "nn", "utils", "sampling", "datasets", "models", "parallel",
           "partition", "native"]
