"""Stage-3 analytics over the engine's association tables — the
distribution and approval analyses (reference novelty_distribution.py /
novelty_approval.py), rebuilt as pure DataFrame operators."""

from timeseries_spark.analytics.approval import (
    approval_bell_matrix,
    approval_cascade,
    first_approval_year,
)
from timeseries_spark.analytics.distribution import (
    novelty_distribution,
    peak_novelty_rows,
    top_therapeutic_area,
)

__all__ = [
    "approval_bell_matrix",
    "approval_cascade",
    "first_approval_year",
    "novelty_distribution",
    "peak_novelty_rows",
    "top_therapeutic_area",
]
