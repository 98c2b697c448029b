"""Pallas TPU kernels for the hot message-passing ops."""

from . import segment_kernels
from . import sddmm_kernels

__all__ = ["segment_kernels", "sddmm_kernels"]
