"""Bucketed tables: pre-partitioned, co-located joins (the shuffle-elimination
scale lever).

A big-table equi-join normally shuffles BOTH sides on the key.  Writing the
tables bucketed (+sorted) on the join key moves that shuffle to WRITE time,
once — every subsequent join of co-bucketed tables plans a sort-merge join
with ZERO exchanges (verified by ``tests/test_dedup_ops.py::
test_cobucketed_join_eliminates_shuffle``; PLANS.md).  At 100 TB this is the
difference between re-shuffling the fact table per query and never shuffling
it at all; the icelite/Iceberg analog is a bucket-partitioned table spec.

Reference analog: the SQLite results table is keyed (implicitly clustered)
by rowid (``app/db.py:21-35``) — here the clustering key is explicit and
chosen for the join workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    The one-time shuffle happens here; joins on ``key`` between tables
    bucketed with the SAME bucket count then need no exchange."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    left_key: str, right_key: str,
                    how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket keys — plans as an
    exchange-free sort-merge join when bucket counts match."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan — the
    audit metric for co-location evidence.  BroadcastExchange is excluded:
    it replicates a small side, it does not shuffle."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
