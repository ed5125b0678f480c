"""Experiment drivers, datasets, result stores, plots, HPO
(reference layers L6/L7)."""

from rayuela_tpu.experiments.datasets import (Dataset, make_synthetic,
                                              read_dataset)
from rayuela_tpu.experiments.drivers import (ALL_METHODS,
                                             run_query_base,
                                             run_train_query_base)
from rayuela_tpu.experiments.store import (list_trials, load_results,
                                           save_results)

__all__ = ["ALL_METHODS", "Dataset", "list_trials", "load_results",
           "make_synthetic", "read_dataset", "run_query_base",
           "run_train_query_base", "save_results"]
