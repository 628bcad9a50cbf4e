"""Round-3 training-pipeline operators: as-of join, sessionization,
deterministic sampling/splits, sequence packing, repetition quality, PII
masking, incremental dedup.  Each test pins semantics against a hand-checked
or independently-computed (pandas) oracle on small synthetic data; the
cross-engine value-hash parity runs in test_catalog_oracle.py.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from apple_ocr_backend_spark.operators.sampling import (
    pack_sequences, rate_to_hex, sample_stratified, split_assign)
from apple_ocr_backend_spark.operators.temporal import (
    asof_join, asof_join_events, sessionize, sessionize_two_phase)
from apple_ocr_backend_spark.operators.dedup import dedup_incremental
from apple_ocr_backend_spark.functions.text import (
    mask_pii, pii_counts, top_bigram_frac_q, top_token_frac_q)


TS = dt.datetime(2024, 1, 1)


def _t(minutes: float) -> dt.datetime:
    return TS + dt.timedelta(minutes=minutes)


# --------------------------------------------------------------------------- #
# as-of join
# --------------------------------------------------------------------------- #

def test_asof_join_matches_merge_asof(spark):
    left = [Row(k=1, ts=_t(m), lid=i) for i, m in enumerate([5, 10, 30])]
    right = [Row(k=1, ts=_t(m), rid=100 + i, px=float(i))
             for i, m in enumerate([1, 9, 30])]
    got = (asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right),
                     on="k", ts="ts", right_tie="rid",
                     payload={"rid": "rid", "px": "px"})
           .orderBy("lid").collect())
    # lid0 @5 -> rid100 (@1); lid1 @10 -> rid101 (@9);
    # lid2 @30 -> rid101: the @30 right row is NOT strictly earlier
    assert [r.asof_rid for r in got] == [100, 101, 101]


def test_asof_join_equal_ts_and_right_tie(spark):
    # two right rows at the same prior timestamp: the larger tie wins;
    # a right row at the LEFT row's own timestamp is never attached
    left = [Row(k=1, ts=_t(10), lid=0)]
    right = [Row(k=1, ts=_t(5), rid=7, px=1.0),
             Row(k=1, ts=_t(5), rid=9, px=2.0),
             Row(k=1, ts=_t(10), rid=11, px=3.0)]
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="k", ts="ts", right_tie="rid",
                    payload={"rid": "rid"}).collect()
    assert got[0].asof_rid == 9


def test_asof_join_events_strict_priority_and_nulls(spark):
    rows = [
        Row(event_id=1, user_id=7, ts=_t(0), event_type="signup", value=1.0),
        Row(event_id=2, user_id=7, ts=_t(5), event_type="purchase",
            value=10.0),
        # same timestamp as the signup below: smaller event_id wins as prior
        Row(event_id=3, user_id=7, ts=_t(9), event_type="signup", value=2.0),
        Row(event_id=4, user_id=7, ts=_t(9), event_type="purchase",
            value=20.0),
        # purchase with NO prior signup for this user
        Row(event_id=5, user_id=8, ts=_t(1), event_type="purchase",
            value=30.0),
    ]
    got = {r["event_id"]: r for r in
           asof_join_events(spark.createDataFrame(rows),
                            "purchase", "signup").collect()}
    assert got[2]["asof_event_id"] == 1
    assert got[4]["asof_event_id"] == 3       # equal-ts, smaller id is prior
    assert got[5]["asof_event_id"] == -1      # coalesced no-match marker
    assert got[5]["asof_ts_s"] is None
    assert got[2]["value_cents"] == 1000


def test_sessionize_gap_boundaries(spark):
    rows = [
        Row(event_id=1, user_id=1, ts=_t(0), event_type="view", value=1.0),
        Row(event_id=2, user_id=1, ts=_t(30), event_type="view", value=1.0),
        # exactly 30 min gap -> SAME session (strictly greater starts new)
        Row(event_id=3, user_id=1, ts=_t(60.001), event_type="view",
            value=1.0),
        # > 30 min after event 2 -> new session
        Row(event_id=4, user_id=2, ts=_t(0), event_type="view", value=2.5),
    ]
    got = (sessionize(spark.createDataFrame(rows), gap_minutes=30)
           .orderBy("user_id", "session_ord").collect())
    assert [(r.user_id, r.session_ord, r.n_events) for r in got] == [
        (1, 1, 2), (1, 2, 1), (2, 1, 1)]
    assert got[2].value_cents == 250


def test_sessionize_two_phase_matches_single_phase_hot_user(spark):
    """The hot-entity variant must be row-identical to the single-window
    form — exercised on a skewed corpus: one hot user with a long dense
    event stream crossing MANY coarse buckets (including sessions that
    straddle bucket boundaries and singleton sessions), plus normal
    users.  bucket_minutes far below the hot user's lifetime forces real
    phase-2 merging."""
    rows = []
    eid = 0
    # hot user 1: 400 events, alternating dense runs and > gap jumps, so
    # sessions repeatedly straddle the 120-minute buckets
    t = 0.0
    for i in range(400):
        eid += 1
        rows.append(Row(event_id=eid, user_id=1, ts=_t(t),
                        event_type="view", value=float(i % 7) / 3))
        t += 50.0 if i % 9 == 8 else 7.0   # 50 > 30-min gap -> new session
    # normal users
    for u in (2, 3):
        for i in range(5):
            eid += 1
            rows.append(Row(event_id=eid, user_id=u, ts=_t(i * 40.0),
                            event_type="view", value=1.25))
    df = spark.createDataFrame(rows)
    one = sessionize(df, gap_minutes=30).orderBy(
        "user_id", "session_ord").collect()
    two = sessionize_two_phase(df, gap_minutes=30, bucket_minutes=120) \
        .orderBy("user_id", "session_ord").collect()
    assert [tuple(r) for r in two] == [tuple(r) for r in one]
    assert len(one) > 40  # the hot user really produced many sessions


# --------------------------------------------------------------------------- #
# sampling / splits / packing
# --------------------------------------------------------------------------- #

def test_rate_to_hex_bounds():
    assert rate_to_hex(0.0) == "00000000"
    # rate 1.0 must keep EVERY doc, including a hash of exactly ffffffff:
    # "g" sorts after all hex strings in both engines
    assert rate_to_hex(1.0) == "g"
    assert rate_to_hex(0.5) == "80000000"
    assert "ffffffff" < rate_to_hex(1.0)


def test_split_assign_deterministic_and_stable_under_growth(spark):
    d1 = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    d2 = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in split_assign(d1).collect()}
    s2 = {r.doc_id: r.split for r in split_assign(d2).collect()}
    # append-stability: growing the corpus never reassigns an existing doc
    assert all(s2[k] == v for k, v in s1.items())
    # rough proportions at n=1000
    frac_train = sum(v == "train" for v in s2.values()) / len(s2)
    assert 0.85 < frac_train < 0.95


def test_sample_stratified_rates_and_default(spark):
    d = (spark.range(0, 2000)
         .select(F.col("id").alias("doc_id"),
                 F.when(F.col("id") % 2 == 0, "en").otherwise("xx")
                 .alias("lang")))
    got = sample_stratified(d, {"en": 1.0}, default_rate=0.0).collect()
    en = [r for r in got if r.lang == "en"]
    xx = [r for r in got if r.lang == "xx"]
    assert all(r.sampled for r in en)      # rate 1.0 keeps everything
    assert not any(r.sampled for r in xx)  # default 0.0 drops everything


def test_pack_sequences_matches_pandas_replay(spark):
    pdf = pd.DataFrame({
        "doc_id": range(40),
        "text": [" ".join(["w"] * (3 + i % 7)) for i in range(40)],
    })
    got = (pack_sequences(spark.createDataFrame(pdf), budget_tokens=16,
                          n_shards=4)
           .orderBy("shard", "bin").toPandas())
    # pandas replay of concatenate-and-chunk
    pdf["shard"] = pdf.doc_id % 4
    pdf["n_tok"] = pdf.text.str.split().str.len()
    rows = []
    for shard, g in pdf.sort_values("doc_id").groupby("shard"):
        cum = 0
        for _, r in g.iterrows():
            rows.append((shard, cum // 16, r.doc_id, r.n_tok))
            cum += r.n_tok
    want = (pd.DataFrame(rows, columns=["shard", "bin", "doc_id", "n_tok"])
            .groupby(["shard", "bin"])
            .agg(n_docs=("doc_id", "size"), tokens=("n_tok", "sum"),
                 first_id=("doc_id", "min"), last_id=("doc_id", "max"))
            .reset_index())
    assert len(got) == len(want)
    for c in ["shard", "bin", "n_docs", "tokens", "first_id", "last_id"]:
        assert list(got[c]) == list(want[c]), c
    # every bin except possibly each shard's last is filled to >= budget
    # only when a doc straddles; fill_q is floor(tokens/budget*1e6)
    assert (got.fill_q == (got.tokens * 1_000_000 // 16)).all()


# --------------------------------------------------------------------------- #
# repetition + PII
# --------------------------------------------------------------------------- #

def test_repetition_fractions(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y x y x y"), (3, "u v w")], ["id", "text"])
    got = {r.id: r for r in df.select(
        "id", top_token_frac_q(F.col("text")).alias("tt"),
        top_bigram_frac_q(F.col("text")).alias("tb")).collect()}
    assert got[1].tt == 750_000            # 'a' is 3 of 4
    assert got[2].tt == 500_000            # 'x' 3 of 6
    # bigrams of doc2: "x y","y x","x y","y x","x y" -> top 3/5
    assert got[2].tb == 600_000
    assert got[3].tt == 333_333


def test_pii_mask_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-a.org now"),
         (2, "call +1 555-123-4567 or 555 987 6543"),
         (3, "clean text only")], ["id", "text"])
    n_mail, n_phone = pii_counts(F.col("text"))
    got = {r.id: r for r in df.select(
        "id", n_mail.alias("nm"), n_phone.alias("np"),
        mask_pii(F.col("text")).alias("m")).collect()}
    assert (got[1].nm, got[1].np) == (1, 0)
    assert got[1].m == "mail <EMAIL> now"
    assert got[2].np == 2
    assert "<PHONE>" in got[2].m and "555" not in got[2].m
    assert (got[3].nm, got[3].np) == (0, 0)
    assert got[3].m == "clean text only"


# --------------------------------------------------------------------------- #
# incremental dedup
# --------------------------------------------------------------------------- #

def test_dedup_incremental_decisions(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different existing content here ok")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, base),                             # exact copy of existing 1
         (11, "fresh unseen content zzz qqq"),   # duplicated in batch
         (12, "fresh unseen content zzz qqq"),   # -> dup of 11
         (13, base + " extra"),                  # near-dup of existing 1
         (14, "totally novel words nothing shared")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in
           dedup_incremental(new, existing, shingle_n=3,
                             threshold_q=500_000).collect()}
    assert len(got) == 5                         # one decision per new doc
    assert (got[10].method, got[10].keep_id) == ("exact_existing", 1)
    assert got[11].method == "new"               # first occurrence kept
    assert (got[12].method, got[12].keep_id) == ("exact_in_batch", 11)
    assert (got[13].method, got[13].keep_id) == ("near_dup_existing", 1)
    assert got[14].method == "new"


def test_dedup_incremental_never_pairs_existing_with_existing(spark):
    # two identical EXISTING docs: incremental must not report them — only
    # new docs get decisions
    existing = spark.createDataFrame(
        [(1, "same text here ok fine"), (2, "same text here ok fine")],
        ["doc_id", "text"])
    new = spark.createDataFrame([(10, "unrelated fresh content")],
                                ["doc_id", "text"])
    got = dedup_incremental(new, existing).collect()
    assert [r.doc_id for r in got] == [10]
    assert got[0].method == "new"


# --------------------------------------------------------------------------- #
# hardening: hot keys and shingle-shape parity
# --------------------------------------------------------------------------- #

def test_sessionize_hot_user_single_shuffle(spark):
    """One user holding ~all events (the skew case): sessionize must stay a
    single window shuffle (no per-key collect, no extra exchanges) and
    produce exact session splits."""
    rows = [Row(event_id=i, user_id=1, ts=_t(i * 31), event_type="view",
                value=1.0) for i in range(2000)]           # every gap > 30m
    rows += [Row(event_id=9001, user_id=2, ts=_t(0), event_type="view",
                 value=1.0)]
    df = spark.createDataFrame(rows)
    out = sessionize(df, gap_minutes=30)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # window + final agg partials: exchanges only for the user_id
    # hash-partitioning (plus AQE reads) — never a global single partition
    assert "SinglePartition" not in plan
    got = out.filter(F.col("user_id") == 1).count()
    assert got == 2000                                      # one per event


def _py_word_shingles(text: str, n: int = 3) -> list[str]:
    """Pure-python reference for the zip-shifted shingle builder."""
    import re
    toks = re.sub(r"\s+", " ", text).strip().split(" ")
    count = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[i:i + n]) for i in range(count)]


def test_word_shingles_matches_python_reference(spark):
    from apple_ocr_backend_spark.functions.text import word_shingles
    cases = ["", "a", "a b", "a b c", "a b c d",
             "  spaced   out\ttokens  here ", "x " * 40,
             "one two three four five six seven"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               ["i", "text"])
    for nn in (2, 3, 5):
        got = {r.i: list(r.sh) for r in
               df.select("i", word_shingles(F.col("text"), nn).alias("sh"))
               .collect()}
        for i, t in enumerate(cases):
            assert got[i] == _py_word_shingles(t, nn), (nn, repr(t))


def test_fingerprint_long_doc_stays_within_prefix(spark):
    """Docs longer than max_chars: no shingle window may read past the
    prefix — the value must equal shingling the materialized prefix (the
    unchanged DuckDB oracle's shape, and what any stored fingerprint was
    built from)."""
    import hashlib
    from apple_ocr_backend_spark.functions.text import fingerprint
    long_text = "".join(chr(97 + (i * 7) % 26) for i in range(5000))
    for text, max_chars in ((long_text, 4096), (long_text[:100], 4096),
                            ("abc", 4096), (long_text, 64)):
        prefix = text[:max_chars]
        want = min(hashlib.md5(prefix[i:i + 8].encode()).hexdigest()
                   for i in range(max(len(prefix) - 7, 1)))
        got = (spark.createDataFrame([(text,)], ["text"])
               .select(fingerprint(F.col("text"), 8, max_chars)
                       .alias("fp")).first().fp)
        assert got == want, (len(text), max_chars)


def test_sample_stratified_empty_rates_uses_default(spark):
    d = spark.range(0, 200).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.lit("xx"))
    got = sample_stratified(d, {}, default_rate=1.0).collect()
    assert all(r.sampled for r in got)
    got0 = sample_stratified(d, {}, default_rate=0.0).collect()
    assert not any(r.sampled for r in got0)


def test_sessionize_two_phase_randomized_parity(spark):
    """Randomized guard for the two-phase == single-window theorem: many
    deterministic pseudo-random event layouts (varying users, jitter,
    gap-straddling offsets), both forms must agree row-for-row — the
    boundary-merge argument has no untested branch left to regress."""
    import hashlib

    def h(i: int) -> int:
        return int(hashlib.md5(f"sess{i}".encode()).hexdigest()[:8], 16)

    rows, eid, t = [], 0, 0.0
    for i in range(600):
        eid += 1
        u = h(i) % 7
        # jumps chosen around the 30-min gap and the 90-min bucket edges
        t += (h(i + 1000) % 9) * [0.2, 5.0, 29.9, 30.0, 30.1, 31.0,
                                  89.0, 90.0, 91.0][h(i + 2000) % 9] / 8
        rows.append(Row(event_id=eid, user_id=u, ts=_t(t),
                        event_type="view", value=float(h(i + 3000) % 50)))
    df = spark.createDataFrame(rows)
    one = sessionize(df, gap_minutes=30).orderBy(
        "user_id", "session_ord").collect()
    two = sessionize_two_phase(df, gap_minutes=30, bucket_minutes=90) \
        .orderBy("user_id", "session_ord").collect()
    assert [tuple(r) for r in two] == [tuple(r) for r in one]


# --------------------------------------------------------------------------- #
# sketch-tier siblings (round-4 verdict #6): approx vs exact error bounds
# --------------------------------------------------------------------------- #

SF01 = "/root/testdata/sf0.1"


def test_rolling_active_users_approx_within_bound(spark):
    """HLL++ sibling must track the exact trailing-7-day distinct count
    within 3*rsd on every day at sf0.1 (rsd=0.02 -> 6%); deterministic
    because HLL is deterministic for a given input set."""
    from apple_ocr_backend_spark.plans.catalog import (
        ROLLING_ACTIVE_RSD, catalog)
    C = catalog()
    exact = {r.day: r.active_users_7d
             for r in C["rolling_active_users"]["spark"](spark, SF01)
             .collect()}
    approx = {r.day: r.active_users_7d_approx
              for r in C["rolling_active_users_approx"]["spark"](spark, SF01)
              .collect()}
    assert sorted(exact) == sorted(approx)
    bound = 3 * ROLLING_ACTIVE_RSD
    for day, n in exact.items():
        rel = abs(approx[day] - n) / n
        assert rel <= bound, (day, approx[day], n, rel)


def test_length_quantiles_approx_rank_bound(spark):
    """approx_percentile guarantees the returned value's RANK is within
    eps = 1/accuracy of the requested quantile; pin that guarantee (plus
    1/n discretization slack) per language and quantile at sf0.1 against
    the raw data, and pin the value itself against the exact entry's
    interpolated percentile to within the widest same-rank-window value
    gap."""
    import pyarrow.parquet as pq

    from apple_ocr_backend_spark.plans.catalog import (
        LENGTH_QUANTILES_ACCURACY, catalog)
    C = catalog()
    ap = C["length_quantiles_approx"]["spark"](spark, SF01).collect()
    docs = pq.read_table(f"{SF01}/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    eps = 1.0 / LENGTH_QUANTILES_ACCURACY
    for row in ap:
        vals = docs.loc[docs.lang == row.lang, "n_chars"] \
            .sort_values().reset_index(drop=True)
        n = len(vals)
        assert n == row.n_docs
        for q, got in [(0.5, row.p50_approx), (0.9, row.p90_approx),
                       (0.99, row.p99_approx)]:
            # rank window of the returned value among the sorted data
            lo = (vals < got).sum() / n
            hi = (vals <= got).sum() / n
            assert lo - (eps + 1.0 / n) <= q <= hi + (eps + 1.0 / n), \
                (row.lang, q, got, lo, hi)


def test_quality_perplexity_matches_pure_python(spark, tmp_path):
    """Independent semantics pin for the CCNet-style unigram-LM scorer:
    recompute the whole entry (top-K vocab with the (-count, tok) tie-break,
    1/N OOV floor, micro-nat floor quantization BEFORE the per-doc sum,
    floor-divided mean, integer cross-multiplied keep flag) in pure Python
    on a hand-built corpus, independent of both the Spark plan and the
    DuckDB oracle text.  The corpus exceeds _PPL_VOCAB_K distinct tokens so
    the OOV path is exercised, carries a corpus-frequency tie straddling
    the K boundary so the tok-ASC tie-break is load-bearing, and includes
    repeated/tab whitespace so tokenization collapse is covered."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from apple_ocr_backend_spark.plans.catalog import _PPL_VOCAB_K, catalog

    texts = {
        1: "the cat sat on the mat",
        2: "the dog  ate\tthe bone",
        3: "zebra quark xylophone unique tokens here",
        4: "the the the the",
        5: "cat dog zebra on mat sat",
        6: "alpha beta gamma delta epsilon",
        7: "alpha beta cat dog bone ate",
        8: "quark here unique epsilon delta gamma",
    }
    tmp = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(texts), type=pa.int64()),
                  "text": [texts[i] for i in sorted(texts)]}),
        f"{tmp}/documents.parquet")

    # pure-python model of the entry
    toks = {i: " ".join(t.split()).split(" ") for i, t in texts.items()}
    tf: dict[tuple[int, str], int] = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    n_corpus = float(sum(tf.values()))
    corpus_c: dict[str, int] = {}
    for (_, t), c in tf.items():
        corpus_c[t] = corpus_c.get(t, 0) + c
    assert len(corpus_c) > _PPL_VOCAB_K  # OOV path is exercised
    ranked = sorted(corpus_c.items(), key=lambda kv: (-kv[1], kv[0]))
    # the tie-break must decide the cut: boundary neighbours tie on count
    assert ranked[_PPL_VOCAB_K - 1][1] == ranked[_PPL_VOCAB_K][1]
    vocab = dict(ranked[:_PPL_VOCAB_K])
    expect = {}
    for i in sorted(texts):
        n_tok, cost = 0, 0
        for (d, t), c in tf.items():
            if d != i:
                continue
            ln = (math.log(n_corpus) - math.log(float(vocab[t]))
                  if t in vocab else math.log(n_corpus))
            cost += c * math.floor(ln * 1_000_000.0)
            n_tok += c
        expect[i] = (n_tok, cost, math.floor(cost / n_tok))
    s = sum(m for _, _, m in expect.values())
    d = len(expect)

    got = catalog()["quality_perplexity"]["spark"](spark, tmp).collect()
    assert [r.doc_id for r in got] == sorted(texts)
    for r in got:
        n_tok, cost, mean = expect[r.doc_id]
        assert (r.n_tok, r.cost_micro, r.mean_micro) == (n_tok, cost, mean)
        assert r.keep == (mean * d <= s)
