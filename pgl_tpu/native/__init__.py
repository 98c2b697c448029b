"""Native (C++) host kernels for graph construction, sampling and walks.

The TPU-native replacement for the reference's Cython ``pgl/graph_kernel.pyx``
+ vendored METIS: a small C++ library compiled on first use and bound via
ctypes (no pybind11 in this image). Device-side compute lives in
``pgl_tpu.ops`` (XLA/Pallas); these kernels run on the TPU *host* CPUs in the
input pipeline.
"""

from . import graph_kernel

__all__ = ["graph_kernel"]
