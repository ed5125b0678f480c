"""Dataset I/O (reference layer L5): TEXMEX xvecs + native C++ reader."""

from rayuela_tpu.io.xvecs import (bvecs_read, bvecs_write, fvecs_read,
                                  fvecs_write, ivecs_read, ivecs_write)

__all__ = ["bvecs_read", "bvecs_write", "fvecs_read", "fvecs_write",
           "ivecs_read", "ivecs_write"]
