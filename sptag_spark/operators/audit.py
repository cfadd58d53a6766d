"""Temporal-leakage audits — the north rule's 'provably zero leakage'.

Every as-of output carries matched_ts, so leakage is a one-aggregation
property check over the SERVED data itself (not a code inspection): no
row's matched_ts may exceed its probe timestamp (or equal it under
strict semantics). Mirrors the reference's Check() self-consistency pass
(BKTIndex.cpp:1207-1245) and its version-visibility predicate
(ExtraDynamicSearcher.h:680).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def leakage_report(
    served: DataFrame,
    probe_ts: str,
    matched_ts: str = "matched_ts",
    strict: bool = False,
) -> dict:
    """One pass over the served frame: rows, matches, violations, and the
    worst (most-future) leak in seconds. violations == 0 is the proof."""
    cmp = (F.col(matched_ts) >= F.col(probe_ts)) if strict else (
        F.col(matched_ts) > F.col(probe_ts)
    )
    lead_sec = (
        F.unix_micros(F.col(matched_ts).cast("timestamp"))
        - F.unix_micros(F.col(probe_ts).cast("timestamp"))
    ) / 1_000_000.0
    row = served.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count(matched_ts).alias("matched"),
        F.sum(cmp.cast("long")).alias("violations"),
        F.max(F.when(cmp, lead_sec)).alias("worst_leak_sec"),
    ).collect()[0]
    return {
        "rows": row["rows"],
        "matched": row["matched"],
        "violations": int(row["violations"] or 0),
        "worst_leak_sec": row["worst_leak_sec"],
    }


def assert_no_leakage(
    served: DataFrame,
    probe_ts: str,
    matched_ts: str = "matched_ts",
    strict: bool = False,
) -> dict:
    rep = leakage_report(served, probe_ts, matched_ts, strict)
    if rep["violations"]:
        raise AssertionError(
            f"temporal leakage: {rep['violations']} rows read data up to "
            f"{rep['worst_leak_sec']}s after their as-of timestamp"
        )
    return rep
