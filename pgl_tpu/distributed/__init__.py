"""Distributed host-side graph service (reference: ``pgl/distributed/``)."""

from . import helper
from .dist_graph import (DistGraphServer, DistGraphClient,
                         stream_shuffle_generator)
from .rpc import RpcServer, RpcClient

__all__ = ["helper", "DistGraphServer", "DistGraphClient",
           "stream_shuffle_generator", "RpcServer", "RpcClient"]
