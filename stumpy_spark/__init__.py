"""stumpy_spark — a from-scratch PySpark-native time-series rollup +
matrix-profile engine with the query capabilities of TDAmeritrade/stumpy.

Public API mirrors the reference's surface (docs/api.rst:12-40) but takes
DataFrames of sequences instead of single ndarrays; see SURVEY.md §2.11.
"""

from . import config, kernels  # noqa: F401

__version__ = "0.1.0"
