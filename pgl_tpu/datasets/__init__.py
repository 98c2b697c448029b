"""Dataset loaders and synthetic generators (reference: ``pgl/dataset.py``)."""

from .synthetic import (random_graph, powerlaw_graph, community_graph,
                        cora_shaped_graph)

__all__ = ["random_graph", "powerlaw_graph", "community_graph",
           "cora_shaped_graph"]
