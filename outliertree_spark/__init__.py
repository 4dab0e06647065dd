"""outliertree_spark: a from-scratch PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of
david-cortes/outliertree (explainable decision-tree-conditioned outlier
detection), extended with the declared checks a web-scale training-data
pipeline needs (uniqueness, referential integrity, distribution drift,
dedup, similarity search, text analysis)."""

from .config import ValidationConfig
from .engine import CheckpointLedger, SparkOutlierTree
from .suite import ValidationSuite

__all__ = ["ValidationConfig", "SparkOutlierTree", "CheckpointLedger",
           "ValidationSuite"]
__version__ = "0.1.0"
