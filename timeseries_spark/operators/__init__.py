"""Pure DataFrame -> DataFrame operators (the engine core)."""

from timeseries_spark.operators.ontology import expand_ontology
from timeseries_spark.operators.scaffold import dense_scaffold, year_spine
from timeseries_spark.operators.scoring import association_score
from timeseries_spark.operators.novelty import add_novelty
from timeseries_spark.operators.windows import argmax_rows, argmin_rows, top1_per_group

__all__ = [
    "expand_ontology",
    "dense_scaffold",
    "year_spine",
    "association_score",
    "add_novelty",
    "argmax_rows",
    "argmin_rows",
    "top1_per_group",
]
