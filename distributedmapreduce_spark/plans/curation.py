"""Lake-maintenance and pipeline-analytics operators, round 3:
MERGE-style upsert, funnel analysis over events, incremental novelty
detection for streaming corpus ingestion, embedding int8 quantization
QA, and the batch twin of the streaming exact-dedup operator.

These extend the reference's surface the same way plans/llm*.py do
(the reference — /root/reference/master.py:99-167 — runs exactly one
batch MapReduce job; everything here is the operational layer a user
replacing it with a lake engine needs).  Every query follows the
ORACLE_PORTABILITY.md rules: BIGINT-pinned outputs, µs-pinned event
timestamps via EVENTS_US, IEEE-deterministic double arithmetic with
identical operation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import norm_fingerprint
from .core import EVENTS_US, query, t
from .llm3 import _md5_uniform, _md5_uniform_sql


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0)
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM updates u
                      WHERE u.o_orderkey = o.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
    """,
)
def merge_upsert_orders(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO (SCD type-1 upsert) expressed as anti-join + union:
    rows matched by the update set are replaced, everything else
    passes through — the lake-table maintenance op behind every CDC
    ingest.  The deterministic "update feed" (keys ≡ 0 mod 7, status
    'U', price +10%) stands in for a real changelog so the oracle can
    replay it.  Scale: one shuffle join on the merge key; with both
    sides bucketed on o_orderkey (sources/io.py::write_bucketed) the
    exchange disappears entirely, which is how a 100 TB MERGE stays
    I/O-bound instead of shuffle-bound.  The double `* 1.1` is a
    single IEEE multiply, bit-identical on both engines."""
    orders = t(spark, sf, "orders")
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    base = orders.join(updates, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return base.unionByName(updates)


@query(
    "event_funnel_conversion",
    oracle=f"""
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM {EVENTS_US} events),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS t_click
      FROM w1),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
                         THEN ts END)
                  OVER (PARTITION BY user_id) AS t_purchase
      FROM w2),
    per_user AS (
      SELECT user_id, max(t_view) AS tv, max(t_click) AS tc,
             max(t_purchase) AS tp
      FROM w3 GROUP BY user_id)
    SELECT count(tv) AS n_view_users,
           count(tc) AS n_click_users,
           count(tp) AS n_purchase_users
    FROM per_user
    """,
)
def event_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user converts a
    stage only by an event STRICTLY AFTER their first entry into the
    previous stage — the product-analytics query sessionization's
    cousin.  Three chained per-user window minima share ONE hash
    partitioning on user_id (no sort needed for unordered min), so
    the whole funnel is a single shuffle plus a scalar fold; at
    100 TB the state per user is three timestamps, never the event
    list.  Timestamps run µs-pinned on both engines (EVENTS_US)."""
    ev = t(spark, sf, "events")
    w = W.partitionBy("user_id")
    ev = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    ev = ev.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    ev = ev.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("t_view").alias("tv"),
        F.max("t_click").alias("tc"),
        F.max("t_purchase").alias("tp"),
    )
    return per_user.agg(
        F.count("tv").alias("n_view_users"),
        F.count("tc").alias("n_click_users"),
        F.count("tp").alias("n_purchase_users"),
    )


@query(
    "incremental_novelty_exact",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))
               AS fingerprint,
             {_md5_uniform_sql('inc', 'doc_id')} < 0.8 AS in_corpus
      FROM documents),
    corpus AS (SELECT DISTINCT fingerprint FROM fp WHERE in_corpus)
    SELECT f.doc_id, (c.fingerprint IS NULL) AS is_novel
    FROM fp f LEFT JOIN corpus c USING (fingerprint)
    WHERE NOT f.in_corpus
    """,
)
def incremental_novelty_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingest novelty check: which docs of an arriving
    batch are exact-duplicates of the existing corpus?  The batch/
    corpus split is the deterministic md5 uniform (80% corpus) so the
    oracle can replay it; production swaps the corpus scan for the
    persisted fingerprint index (operators/index_store.py) the same
    way dedup_minhash_lsh does — an arriving batch then joins against
    an index read, not a 100 TB corpus re-scan, and the join
    broadcasts whenever the BATCH side is the small one.  This is the
    continuous-crawl counterpart of dedup_exact (plans/llm.py)."""
    docs = t(spark, sf, "documents")
    fp = docs.select(
        "doc_id",
        norm_fingerprint(F.col("text")).alias("fingerprint"),
        (_md5_uniform("inc", F.col("doc_id")) < 0.8).alias("in_corpus"),
    )
    corpus = (
        fp.filter(F.col("in_corpus"))
        .select("fingerprint")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    batch = fp.filter(~F.col("in_corpus"))
    return batch.join(corpus, "fingerprint", "left").select(
        "doc_id", F.col("hit").isNull().alias("is_novel")
    )


@query(
    "embedding_quantize_error",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_aggregate(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE))), 'max') AS scale
      FROM embeddings)
    SELECT vec_id,
           CAST(floor(list_aggregate(
             list_transform(v, x -> abs(x -
               (floor((x / scale) * 127.0 + 0.5) * scale) / 127.0)),
             'max') * 1e7) AS BIGINT) AS max_err_e7
    FROM s WHERE scale > 0
    """,
)
def embedding_quantize_error(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization QA: per-vector absmax scale,
    q = floor(x/scale*127 + 0.5), report the max reconstruction error
    (scaled to 1e-7 ticks, BIGINT-pinned per ORACLE_PORTABILITY.md).
    This is the storage-side op that turns a 100 TB float32 embedding
    corpus into 25 TB of int8 for ANN serving — the error histogram
    is the acceptance gate.  All arithmetic is elementwise IEEE double
    in the same operation order on both engines (floor, not round —
    round() ties break differently across engines), so the oracle is
    bit-exact.  Map-side only: no shuffle, no UDF — array lambdas run
    in codegen."""
    emb = t(spark, sf, "embeddings")
    s = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ).alias("scale"),
    ).filter(F.col("scale") > 0)
    scale = F.col("scale")
    err = F.transform(
        "v",
        lambda x: F.abs(
            x - (F.floor((x / scale) * 127.0 + 0.5) * scale) / 127.0
        ),
    )
    return s.select(
        "vec_id",
        F.floor(F.array_max(err) * 1e7).cast("long").alias("max_err_e7"),
    )


@query(
    "stream_dedup_counts",
    oracle="""
    WITH stream AS (
      SELECT event_id, event_type FROM events
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_id % 10 = 0)
    SELECT event_type, count(DISTINCT event_id) AS n
    FROM stream GROUP BY event_type
    """,
)
def stream_dedup_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of streaming/joins.py::dedup_events_stream (the
    at-least-once -> exactly-once repair): a deterministic 10%
    re-delivery is unioned in, duplicates dropped on event_id, then
    counted per type — equal to counting the original stream, which
    is exactly the exactly-once guarantee.  The streaming version
    bounds its state with dropDuplicatesWithinWatermark (one key per
    event_id inside the watermark, evicted after);
    tests/test_streaming.py asserts stream == batch.  This entry
    makes the dedup operator driver-visible."""
    ev = t(spark, sf, "events").select("event_id", "event_type")
    resent = ev.filter(F.col("event_id") % 10 == 0)
    stream = ev.unionByName(resent)
    return (
        stream.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
