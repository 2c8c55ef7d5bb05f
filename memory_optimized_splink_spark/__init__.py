"""memory_optimized_splink_spark — a brand-new PySpark-native Fellegi-Sunter
record-linkage engine with the query/data-processing capabilities of
DonorAtlas/memory-optimized-splink (Splink 4.0.7 fork), re-expressed
Spark-first. See SURVEY.md for the semantic map into the reference."""

from .comparison_library import And, Not, Or
from .linker import GraphMetricsResults, SparkLinker
from .model import (
    BlockingRule,
    Comparison,
    ComparisonLevel,
    Settings,
    block_on,
)
from .session import get_spark
from .settings_creator import SettingsCreator

__all__ = [
    "SparkLinker", "Settings", "SettingsCreator", "Comparison",
    "ComparisonLevel", "BlockingRule", "block_on", "get_spark",
    "And", "Or", "Not", "GraphMetricsResults",
]
