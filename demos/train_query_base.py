#!/usr/bin/env python
"""Train/query/base demo — thin wrapper over `rayuela_tpu.cli` (the
installable `rayuela-demo` console script carries the real driver).

Examples:
  python demos/train_query_base.py --dataset synthetic-small --m 4 \
      --h 16 --niter 3 --knn 100
  python demos/train_query_base.py --dataset sift1m --m 8 --ntrials 10
  python demos/train_query_base.py --dataset mnist --protocol query_base
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from rayuela_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
