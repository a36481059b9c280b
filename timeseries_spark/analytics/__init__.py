"""Stage-3 analytics over the engine's association tables — the
distribution and approval analyses (reference novelty_distribution.py /
novelty_approval.py), rebuilt as pure DataFrame operators."""

from timeseries_spark.analytics.approval import (
    approval_bell_from_timeline,
    approval_bucket_bell,
    approval_bell_matrix,
    approval_cascade,
    approval_cascade_from_timeline,
    approval_peaks,
    early_phase_targets,
    approval_timeline,
    first_approval_year,
    novel_drug_target_table,
    novel_drug_targets,
    offset_matrix,
    phase_peaks,
)
from timeseries_spark.analytics.distribution import (
    all_pairs_at,
    biotype_breakdown,
    by_datatype,
    distribution_peaks,
    novel_pairs_at,
    novelty_distribution,
    peak_novelty_rows,
    target_facet_counts,
    top_therapeutic_area,
)

__all__ = [
    "approval_bell_from_timeline",
    "approval_bell_matrix",
    "approval_bucket_bell",
    "approval_cascade",
    "approval_cascade_from_timeline",
    "approval_peaks",
    "early_phase_targets",
    "approval_timeline",
    "all_pairs_at",
    "biotype_breakdown",
    "by_datatype",
    "distribution_peaks",
    "novel_pairs_at",
    "first_approval_year",
    "novel_drug_target_table",
    "novel_drug_targets",
    "novelty_distribution",
    "offset_matrix",
    "peak_novelty_rows",
    "phase_peaks",
    "target_facet_counts",
    "top_therapeutic_area",
]
