"""timeseries_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the ``opentargets/timeseries`` reference pipeline (see
SURVEY.md): retro-timestamped evidence dating, ontology expansion, yearly
harmonic-sum association scores, logistic novelty detection, and the
downstream distribution / approval analytics — plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB deployment needs.

Design principles (SURVEY.md §1.4, §4):
- pure DataFrame -> DataFrame operators, explicit schemas, no RDDs;
- zero row-at-a-time Python UDFs in hot paths (native Column expressions and
  SQL higher-order functions only; Pandas UDFs for extension ops where no
  native expression exists);
- Catalyst does the physical planning: broadcast hints on known-small dims,
  AQE for shuffle sizing/skew, partitioned Parquet layout for pruning.
"""

from timeseries_spark.config import EngineConfig
from timeseries_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
