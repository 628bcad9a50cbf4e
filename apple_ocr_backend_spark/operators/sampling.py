"""Deterministic sampling, splitting, and sequence packing for training-data
pipelines.

Everything here is a pure function of the row's own columns — no RNG state,
no ``rand()``:

* **hash-bucket splits** (train/val/test) use the first 8 hex chars of
  ``md5(salt || id)`` compared LEXICOGRAPHICALLY against a hex threshold.
  Equal-length lowercase hex strings order exactly like their integer
  values, both engines emit lowercase md5 hex, so a split decision is one
  string compare — no hex->int conversion, bit-identical in Spark and
  DuckDB, stable under re-partitioning, re-runs, and engine swaps.  This is
  the property a 100 TB pipeline needs: the split of a document never
  changes when the corpus around it does (``rand()`` splits are neither
  reproducible nor append-stable).
* **stratified rates** broadcast a tiny (stratum -> threshold) relation and
  apply the same hash compare per stratum — map-only, zero shuffles on the
  corpus side.
* **sequence packing** (filling fixed token-budget training bins) is
  concatenate-and-chunk: shard by a deterministic key, order within the
  shard, running token total, ``bin = floor(cum_before / budget)``.  One
  shuffle (the shard window); bins never cross shards so packing
  parallelizes embarrassingly at any corpus size.  A doc larger than the
  budget gets its own bin(s) worth of span rather than stalling the packer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.text import token_count


def _hash_hex(salt: str, id_col) -> F.Column:
    """First 8 lowercase hex chars of md5(salt || id) — the split key."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))),
                       1, 8)


def rate_to_hex(rate: float) -> str:
    """Threshold such that P[hash8 < threshold] = rate over uniform md5:
    the 8-hex-digit value floor(rate * 16^8), zero-padded (lowercase).
    rate >= 1.0 returns "g", which sorts after every hex string — keep
    ALL, including the 16^-8 corner where the hash is exactly ffffffff."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16 ** 8), "08x")


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 train: float = 0.9, val: float = 0.05,
                 salt: str = "split") -> DataFrame:
    """Adds a deterministic ``split`` column: train/val/test by hash bucket
    (train | val | test fractions; test takes the remainder)."""
    h = _hash_hex(salt, F.col(id_col))
    return df.withColumn(
        "split",
        F.when(h < F.lit(rate_to_hex(train)), "train")
        .when(h < F.lit(rate_to_hex(train + val)), "val")
        .otherwise("test"))


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "rate") -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``md5(salt || id) < threshold(stratum)``.

    The rates relation is a handful of rows — broadcast join, so the corpus
    never shuffles; the keep decision is one string compare per row.
    Strata absent from ``rates`` fall back to ``default_rate`` (0 = drop),
    so a surprise stratum in the data cannot silently keep everything.
    """
    h = _hash_hex(salt, F.col(id_col))
    if not rates:
        # every stratum falls back to the default rate — no join needed
        # (and createDataFrame cannot infer a schema from an empty list)
        return df.withColumn("sampled",
                             h < F.lit(rate_to_hex(default_rate)))
    spark = df.sparkSession
    rate_rows = [(k, rate_to_hex(v)) for k, v in sorted(rates.items())]
    rdf = spark.createDataFrame(rate_rows, [stratum_col, "__thresh"])
    return (df.join(F.broadcast(rdf), stratum_col, "left")
            .withColumn("__thresh",
                        F.coalesce(F.col("__thresh"),
                                   F.lit(rate_to_hex(default_rate))))
            .withColumn("sampled", h < F.col("__thresh"))
            .drop("__thresh"))


def pack_sequences(df: DataFrame, budget_tokens: int = 512,
                   n_shards: int = 8, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Greedy contiguous sequence packing: assign docs to fixed
    token-budget bins for training-batch assembly.

    shard = id % n_shards (deterministic, any stable key works); within a
    shard the scheme is concatenate-and-chunk (the standard pretraining
    packing shape): conceptually concatenate the shard's docs in id order
    and cut the token stream every ``budget`` tokens — a doc belongs to the
    bin where it STARTS, i.e. ``bin = floor(cum_before / budget)`` with
    ``cum_before`` the running token total of all prior docs in the shard.
    Single window pass, reproducible, and the only cross-doc state is the
    running sum (no driver-side loop, no per-bin list).

    Returns one row per bin: shard, bin, n_docs, tokens, fill_q
    (floor(tokens/budget * 1e6), > 1e6 means an over-budget doc straddles).

    ``n_shards`` is the parallelism knob: each shard's window is one
    sorted task, so size it to corpus/(tokens you want one task to pack) —
    the bench default 8 suits the test corpus; a 100 TB run wants
    thousands (bins never cross shards, so shard count does not change
    any bin's content, only which task builds it).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        (F.col(id_col) % n_shards).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"))
    w = (W.partitionBy("shard").orderBy("id")
         .rowsBetween(W.unboundedPreceding, -1))
    binned = toks.withColumn(
        "bin", (F.coalesce(F.sum("n_tok").over(w), F.lit(0))
                / budget_tokens).cast("long"))
    return (binned.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("tokens"),
                 F.min("id").alias("first_id"),
                 F.max("id").alias("last_id"))
            .withColumn("fill_q",
                        F.floor(F.col("tokens") / budget_tokens * 1_000_000)
                        .cast("long")))
