"""Grouped top-k — the reference's QueryResultSet semantics.

SPTAG maintains a bounded max-heap of k (VID, dist) pairs per query with
VID tie-break (AnnService/inc/Core/QueryResultSet.h:77-119) and truncates
postings to the nearest ``limit`` rows per partition
(ExtraStaticSearcher.h:781-846). Both are ``row_number() <= k`` over a
per-group ordered window. Spark pushes a per-partition bounded heap below
the shuffle automatically for the global case (TakeOrderedAndProject);
for the grouped case the window is evaluated with partial sort + limit per
group — no full materialization of losers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k best rows per group under the given ordering.

    Pass fully-specified orderings (including a deterministic tiebreak
    column — the reference tie-breaks on VID, QueryResultSet.h:83-85) so
    results are stable across engines and runs.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_top_k(
    df: DataFrame, order_by: Sequence[Column | str], k: int
) -> DataFrame:
    """Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    per-partition bounded heaps merged at the driver, exactly the
    reference's aggregator concat + client merge (AggregatorService.cpp:
    324-372) but with the re-sort the reference skips."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return df.orderBy(*order).limit(k)
