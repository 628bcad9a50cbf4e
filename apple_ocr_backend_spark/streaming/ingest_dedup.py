"""Streaming ingestion dedup: every arriving micro-batch is deduped against
the ACCUMULATED accepted corpus before it is committed — the continuous form
of ``operators.dedup.dedup_incremental``.

The scale lever this module demonstrates is the **stored signature table**:
accepted rows are persisted WITH their md5 digest and MinHash signature
array, so checking a new batch never re-shingles the existing corpus —
exact dedup is a digest anti-join against stored digests, near-dup candidate
generation is a band equi-join against band keys derived from stored
signatures (k strings per accepted row, no text work), and only the
candidate pairs' texts are ever shingled for exact-Jaccard verification.
Per batch the cost is O(batch) shingling + O(candidates) verification +
one join against the accepted store per axis, which is the ingestion shape
a 100 TB continuously-fed pipeline runs.

Exactly-once: the same (run_id, epoch) icelite ledger as
``stream_extract.commit_epoch`` — a replayed micro-batch is a no-op, so a
doc can never be double-accepted OR double-checked into a different
decision (the accepted store only grows via committed epochs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators.dedup import (band_keys, connected_components,
                               jaccard_verify, minhash_signature)
from ..sources.icelite import Table


def _with_identity(docs: DataFrame, id_col: str, text_col: str,
                   k: int, shingle_n: int) -> DataFrame:
    """(id, text, digest, sigs) — the row shape the accepted store keeps.
    ``sigs`` is the k-MinHash signature as an array column; band keys are
    derived from it at join time, so the store never re-shingles.

    LEFT join: a doc whose text produces no shingle rows (NULL text) keeps
    a NULL signature instead of silently vanishing — it still flows
    through the exact/accept path (a NULL digest matches nothing, so it is
    accepted as 'new', the same outcome dedup_incremental gives it), and
    the band explode of a NULL array simply yields no candidate rows."""
    sig = minhash_signature(docs, id_col, text_col, k, shingle_n)
    sigs = F.array(*[F.col(f"s{i}") for i in range(k)])
    return (docs.select(F.col(id_col).alias("id"),
                        F.col(text_col).alias("text"))
            .join(sig.select(F.col(id_col).alias("id"),
                             sigs.alias("sigs")), "id", "left"))


def _band_rows(idf: DataFrame, k: int, bands: int) -> DataFrame:
    # band keys come from operators.dedup.band_keys — the ONE definition —
    # so keys derived from STORED signature arrays can never diverge from
    # the keys the batch-side candidate generators compute
    keys = band_keys([F.col("sigs")[i] for i in range(k)], bands)
    return idf.select("id", F.posexplode(keys).alias("band", "bkey"))


def ingest_dedup_epoch(table: Table, batch: DataFrame, epoch_id: int,
                       run_id: str = "run", id_col: str = "doc_id",
                       text_col: str = "text", k: int = 12, bands: int = 4,
                       shingle_n: int = 3,
                       threshold_q: int = 500_000) -> bool:
    """Idempotently dedup-and-accept one micro-batch into ``table``.

    Decision order per batch doc (deterministic):

    1. exact duplicate WITHIN the batch (digest row_number, min id wins);
    2. exact duplicate of an ACCEPTED doc (digest join on stored digests);
    3. near-duplicate of an accepted doc (band join: batch signatures vs
       band keys derived from STORED signatures, exact-Jaccard verify on
       the candidate pairs only);
    4. near-duplicate WITHIN the surviving batch docs (band self-join +
       verify + connected components; each cluster's min id is accepted,
       the rest are dropped) — closes the blind spot a batch boundary
       would otherwise introduce between two near-identical arrivals;
    5. otherwise accepted — appended with digest + signature so future
       batches check against it at stored-signature cost.

    Returns True if committed, False for a replayed epoch (no-op).
    """
    key = f"{run_id}/{epoch_id}"
    if key in table.committed_units("epoch_key"):
        return False
    spark = batch.sparkSession
    new = _with_identity(batch, id_col, text_col, k, shingle_n) \
        .withColumn("digest", F.md5("text")).persist()
    acc = accepted = stage3 = None
    try:
        n_in = new.count()
        # 1. in-batch exact: min id per digest survives this stage
        wdig = W.partitionBy("digest").orderBy("id")
        stage1 = (new.withColumn("rn", F.row_number().over(wdig))
                  .filter(F.col("rn") == 1).drop("rn"))
        n_batch_dup = n_in - stage1.count()

        have = len(table.snapshots()) > 0
        if have:
            acc = table.read(spark).persist()
            # 2. exact vs accepted (stored digests — no text work)
            stage2 = stage1.join(acc.select("digest"), "digest",
                                 "left_anti")
            # 3. near-dup vs accepted: band keys from STORED signatures
            a = _band_rows(acc.select("id", "sigs"), k, bands).alias("a")
            b = _band_rows(stage2.select("id", "sigs"), k, bands).alias("b")
            cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                            & (F.col("a.bkey") == F.col("b.bkey")))
                     .select(F.col("a.id").alias("id_a"),
                             F.col("b.id").alias("id_b"))
                     .distinct())
            corpus = (acc.select("id", "text")
                      .unionByName(stage2.select("id", "text"))
                      .withColumnRenamed("id", id_col)
                      .withColumnRenamed("text", text_col))
            near_hits = (jaccard_verify(corpus, cands, id_col, text_col,
                                        shingle_n, threshold_q)
                         .select(F.col("id_b").alias("id")).distinct())
            stage3 = stage2.join(near_hits, "id", "left_anti")
        else:
            stage3 = stage2 = stage1
        stage3 = stage3.persist()
        n_stage3 = stage3.count()
        # 4. near-dup WITHIN the surviving batch docs: self band join,
        #    verify, components — keep each cluster's min id
        sb = _band_rows(stage3.select("id", "sigs"), k, bands)
        scands = (sb.alias("x").join(
                      sb.alias("y"),
                      (F.col("x.band") == F.col("y.band"))
                      & (F.col("x.bkey") == F.col("y.bkey"))
                      & (F.col("x.id") < F.col("y.id")))
                  .select(F.col("x.id").alias("id_a"),
                          F.col("y.id").alias("id_b"))
                  .distinct())
        sverified = jaccard_verify(
            stage3.select(F.col("id").alias(id_col),
                          F.col("text").alias(text_col)),
            scands, id_col, text_col, shingle_n, threshold_q)
        if sverified.limit(1).count():
            drop = (connected_components(sverified)
                    .filter(F.col("id") != F.col("component"))
                    .select("id"))
            accepted = stage3.join(drop, "id", "left_anti")
        else:
            accepted = stage3
        accepted = accepted.persist()
        n_accepted = accepted.count()
        n_exact_existing = stage1.count() - stage2.count() if have else 0
        n_near = (stage2.count() - n_stage3) if have else 0
        n_near_batch = n_stage3 - n_accepted
        table.append(
            accepted.select("id", "text", "digest", "sigs"),
            operation=f"ingest/epoch={key}",
            summary={"epoch_key": key, "epoch": epoch_id, "run_id": run_id,
                     "docs_in": n_in, "accepted": n_accepted,
                     "dup_exact_batch": n_batch_dup,
                     "dup_exact_existing": n_exact_existing,
                     "near_dup_existing": n_near,
                     "near_dup_batch": n_near_batch})
    finally:
        new.unpersist()
        if acc is not None:
            acc.unpersist()
        if stage3 is not None:
            stage3.unpersist()
        if accepted is not None:
            accepted.unpersist()
    return True


def stream_ingest_dedup(spark: SparkSession, input_dir: str, table_dir: str,
                        checkpoint_dir: str, schema_ddl: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 12, bands: int = 4, shingle_n: int = 3,
                        threshold_q: int = 500_000,
                        max_files_per_trigger: int | None = None,
                        run_id: str | None = None):
    """Continuously dedup-ingest doc parquet files from ``input_dir`` into
    the accepted-corpus table at ``table_dir`` (AvailableNow: drains, then
    stops).  Same checkpoint-lineage-scoped exactly-once contract as
    ``stream_extract``."""
    from .stream_extract import _checkpoint_run_id
    table = Table(table_dir)
    if run_id is None:
        run_id = _checkpoint_run_id(checkpoint_dir)
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    def commit_batch(batch: DataFrame, epoch_id: int) -> None:
        ingest_dedup_epoch(table, batch, epoch_id, run_id, id_col, text_col,
                           k, bands, shingle_n, threshold_q)

    return (docs.writeStream
            .foreachBatch(commit_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
