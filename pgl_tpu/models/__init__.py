"""Reference model assemblies built from the layer zoo."""

from .gnn import GCN, GAT, GraphSage, GIN, DeepGCNII, APPNPModel, SGC

__all__ = ["GCN", "GAT", "GraphSage", "GIN", "DeepGCNII", "APPNPModel", "SGC"]
