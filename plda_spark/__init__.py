"""plda_spark — a PySpark-native analytics engine with the capabilities of
openbigdatagroup/plda (parallel LDA via collapsed Gibbs sampling), plus the
relational, dedup, similarity, text-analysis, and streaming operators a
large-scale training-data pipeline needs.

Reference: /root/reference (plda, Apache-2.0). This is a re-expression on
Spark's execution model, not a port: the Gibbs kernel is numpy inside
Arrow pandas UDFs, model exchange is broadcast + partial/final
aggregation (≙ the reference's per-iteration AllReduce), and everything
relational is plain Catalyst-optimized DataFrame code.
"""

from plda_spark.lda.model import LDAModel
from plda_spark.lda.train import TrainConfig, TrainResult, train, train_documents
from plda_spark.lda import infer
from plda_spark.session import get_spark

__all__ = [
    "LDAModel",
    "TrainConfig",
    "TrainResult",
    "train",
    "train_documents",
    "infer",
    "get_spark",
]

__version__ = "0.1.0"
