"""Application mini-frameworks (reference: ``apps/``): GNNAutoScale
historical embeddings, the PGLBox-style unsupervised engine, rec/KG
toolkits built on the core framework."""

from . import gnn_autoscale
from . import unsupervised
from . import graph4rec
from . import pglbox
from . import pglbox_model

__all__ = ["gnn_autoscale", "unsupervised", "graph4rec", "pglbox",
           "pglbox_model"]
