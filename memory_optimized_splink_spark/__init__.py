"""memory_optimized_splink_spark — a brand-new PySpark-native Fellegi-Sunter
record-linkage engine with the query/data-processing capabilities of
DonorAtlas/memory-optimized-splink (Splink 4.0.7 fork), re-expressed
Spark-first. See SURVEY.md for the semantic map into the reference."""

from .linker import SparkLinker
from .model import (
    BlockingRule,
    Comparison,
    ComparisonLevel,
    Settings,
    block_on,
)
from .session import get_spark

__all__ = [
    "SparkLinker", "Settings", "Comparison", "ComparisonLevel",
    "BlockingRule", "block_on", "get_spark",
]
