"""rayuela_tpu — a TPU-native multi-codebook quantization (MCQ) engine.

A from-scratch JAX/XLA/Pallas framework with the capability set of
Rayuela.jl (PQ, OPQ, RVQ, ERVQ, ChainQ, LSQ, LSQ++/SR, CQ interop;
ADC linear-scan search; recall evaluation; TEXMEX/HDF5 I/O), designed
TPU-first: every hot loop is a matmul on the MXU or a fused Pallas
kernel, training statistics are psum-able across a device mesh, and the
base-set scan shards over the data axis with an all-gather top-k merge.

Data model (row-major, 0-based — see `rayuela_tpu.utils`):
  X (n, d) f32 · C (m, h, d) or (m, h, d/m) f32 · B (n, m) int32.
"""

from rayuela_tpu import api, utils  # noqa: F401

__version__ = "1.0.0"          # keep in sync with pyproject.toml
                               # (tests/test_packaging.py enforces it)

__all__ = ["api", "experiments", "io", "models", "ops", "parallel",
           "search", "utils", "__version__"]
