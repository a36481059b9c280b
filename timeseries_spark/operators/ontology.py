"""Ontology expansion: direct evidence -> indirect evidence.

The disease ontology is a flattened DAG — each disease row carries an
``ancestors: array<string>`` column — so propagation is a single
explode+join, never an iterative graph traversal (reference:
timeseries.py:339-366; SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_ontology(
    evidence: DataFrame,
    disease: DataFrame,
    disease_id_col: str = "diseaseId",
    id_col: str = "id",
    ancestors_col: str = "ancestors",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fan each evidence row out to its disease's self-or-ancestor set.

    Every evidence row is re-assigned to each member of
    ``{diseaseId} ∪ ancestors(diseaseId)`` (timeseries.py:350-364): an inner
    equi join against the exploded ``array_union(array(id), ancestors)``.
    The disease dimension is small (tens of thousands of rows) — broadcast
    it so the fan-out join is shuffle-free at any evidence scale.
    """
    expanded = disease.select(
        F.col(id_col).alias(disease_id_col),
        F.explode(
            F.array_union(F.array(F.col(id_col)), F.coalesce(F.col(ancestors_col), F.array()))
        ).alias("__expandedDiseaseId"),
    )
    if broadcast_dim:
        expanded = F.broadcast(expanded)
    return (
        evidence.join(expanded, disease_id_col, "inner")
        .drop(disease_id_col)
        .withColumnRenamed("__expandedDiseaseId", disease_id_col)
    )
