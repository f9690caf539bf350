"""Training-corpus curation, stage 2 (SURVEY.md §2.2 extension
surface): benchmark decontamination, sequence packing, deterministic
weighted sampling, source-mixture balancing, and the global training
shuffle.  Everything here is portable-hash based (md5) so each query
has a bit-identical DuckDB oracle — no seeded RNG, no engine-specific
hashing — and every plan is a shuffle-bounded DataFrame composition
(no Python in any hot path).

Scale notes (the 100 TB story for each):
- decontamination joins on the shingle STRING with a document-
  frequency cap, so fan-out is bounded per shingle and the eval side
  (benchmarks are small) broadcasts;
- sequence packing uses the distributed two-pass prefix sum
  (operators/prefix_sum.py) over range-partitioned doc order — the
  naive global-window cumsum would funnel the corpus through one
  partition;
- weighted sampling / mixture balancing / shuffle-sharding derive
  per-row uniforms from md5, so they are single-scan map-side filters
  (plus one bounded window for the per-source ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import shingles as _shingles, tokens as _tokens
from ..operators.prefix_sum import keyed_prefix_sum
from .core import query, t

# Portable per-row uniform in [0, 1): the top 32 bits of md5 divided
# by 2^32.  k/2^32 is exact in a double (power-of-two denominator), so
# Spark and DuckDB produce bit-identical values — usable in oracle-
# checked filters, unlike rand(seed) or xxhash64.
_TWO32 = 4294967296.0


def _md5_u32(tag: str, col) -> "F.Column":
    """Top 32 bits of md5(tag:value) as a BIGINT — the portable hash
    primitive (identical in DuckDB via _md5_u32_sql)."""
    h = F.md5(F.concat(F.lit(tag + ":"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _md5_uniform(tag: str, col) -> "F.Column":
    return _md5_u32(tag, col) / F.lit(_TWO32)


def _md5_u32_sql(tag: str, expr: str) -> str:
    # Hex -> integer via per-digit arithmetic rather than DuckDB's
    # CAST('0x..' AS BIGINT), which only exists in DuckDB >= 0.10 —
    # version skew in the driver's engine is the one failure class
    # the round-2 gate couldn't explain, so every oracle construct is
    # pinned to arithmetic any engine version evaluates identically.
    # (Value-equality of the two forms is asserted by
    # tests/test_oracle_portability.py::test_md5_uniform_sql_portable.)
    h = f"substr(md5(concat('{tag}:', CAST({expr} AS VARCHAR))), 1, 8)"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"CAST({terms} AS BIGINT)"


def _md5_uniform_sql(tag: str, expr: str) -> str:
    return f"({_md5_u32_sql(tag, expr)} / {_TWO32})"


_DECON_N = 3  # shingle width (words)
_DECON_MIN_SHARED = 2  # flag pairs sharing >= this many shingles
_DECON_DF_CAP = 50  # drop shingles present in more docs than this

_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(ws) - {_DECON_N} + 2),
             i -> array_to_string(ws[i:i + {_DECON_N} - 1], ' '))) AS s
    FROM toks WHERE len(ws) >= {_DECON_N}
  )
), capped AS (
  SELECT doc_id, s FROM sh
  QUALIFY count(*) OVER (PARTITION BY s) <= {_DECON_DF_CAP}
)
SELECT t.doc_id AS train_doc_id,
       e.doc_id AS eval_doc_id,
       count(*) AS shared_ngrams
FROM (SELECT * FROM capped WHERE doc_id % 50 <> 0) t
JOIN (SELECT * FROM capped WHERE doc_id % 50 = 0) e USING (s)
GROUP BY 1, 2
HAVING count(*) >= {_DECON_MIN_SHARED}
"""


@query("decontaminate_ngram_overlap", oracle=_DECON_ORACLE)
def decontaminate_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 2
    distinct word 3-grams with any eval-set doc (eval set here: every
    50th doc_id — stand-in for a held-out benchmark suite).

    Plan shape: ONE scan, ONE shuffle, NO self-join.  Shingles are
    exploded and grouped once; each shingle's posting lists (train ids
    and eval ids) are collected in the same aggregate that computes
    its document frequency, shingles over the df cap are dropped
    (stop-phrase shingles are what makes shingle joins quadratic at
    scale — same armor as dedup_ngram_jaccard), and the surviving
    (train x eval) pairs explode from the posting lists.  Because the
    cap bounds df, every collect_list is <= cap elements and the
    per-shingle pair fan-out is <= cap^2 — memory- and shuffle-safe
    by construction at any corpus size.  (The naive formulation —
    df-window then train/eval self-join — scans and windows the corpus
    twice: Spark's exchange reuse does not fire across the join
    branches because lambda-function expression ids defeat plan
    canonicalization.)"""
    is_eval = (F.col("doc_id") % 50) == 0
    sh = (
        t(spark, sf, "documents")
        .select("doc_id", F.explode(_shingles("text", _DECON_N)).alias("s"))
    )
    postings = (
        sh.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.collect_list(F.when(~is_eval, F.col("doc_id"))).alias(
                "train_ids"
            ),
            F.collect_list(F.when(is_eval, F.col("doc_id"))).alias(
                "eval_ids"
            ),
        )
        .filter(
            (F.col("df") <= _DECON_DF_CAP)
            & (F.size("train_ids") > 0)
            & (F.size("eval_ids") > 0)
        )
    )
    pairs = postings.select(
        F.explode("train_ids").alias("train_doc_id"), "eval_ids"
    ).select("train_doc_id", F.explode("eval_ids").alias("eval_doc_id"))
    return (
        pairs.groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= _DECON_MIN_SHARED)
    )


_PACK_BUDGET = 256  # tokens per packed training sequence

# Every intermediate is pinned to BIGINT: DuckDB's sum() over BIGINT
# returns HUGEINT (INT128), and HUGEINT leaks into every downstream
# expression (`/` promotes to DOUBLE, least/greatest unify to HUGEINT,
# and the HUGEINT -> pandas dtype mapping differs across DuckDB
# releases) — the round-2 driver hash-fail class.  CAST the window sum
# to BIGINT at the source and use integer division `//` so all
# arithmetic — including the output column — is 64-bit integer on any
# engine version, exactly matching Spark's LongType.
_PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
  FROM documents
), cum AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
  FROM tok WHERE n > 0
)
SELECT doc_id, seq_id,
       CAST(least((seq_id + 1) * {_PACK_BUDGET}, start + n)
         - greatest(seq_id * {_PACK_BUDGET}, start) AS BIGINT) AS n_tokens
FROM (
  SELECT doc_id, n, start,
         unnest(range(
           start // {_PACK_BUDGET},
           (start + n - 1) // {_PACK_BUDGET} + 1
         )) AS seq_id
  FROM cum
)
"""


@query("sequence_packing", oracle=_PACK_ORACLE)
def sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LM training
    prep): documents are concatenated in doc_id order and sliced into
    fixed 256-token sequences; a doc spanning a boundary contributes
    to every sequence it overlaps.  Output: one row per (doc, seq)
    with the token count the doc contributes to that sequence.

    The cumulative token offset is the bucketed keyed prefix sum
    (operators/prefix_sum.py::keyed_prefix_sum): per-bucket totals, a
    tiny bucket-level window for the bases, broadcast back, and a
    partition-parallel within-bucket window — NOT a global window,
    which would put the whole corpus through one partition.  (The
    encounter-order prefix sum is wrong here: it re-executes its
    lineage for the totals and output passes, and repartitionByRange
    boundaries are not execution-stable — caught by the 10x oracle
    sweep.)  After the offsets exist, bin assignment is pure
    arithmetic + a bounded explode (a doc spans at most
    ceil(n/budget)+1 sequences)."""
    docs = (
        t(spark, sf, "documents")
        .select("doc_id", F.size(_tokens("text")).alias("n"))
        .filter(F.col("n") > 0)
    )
    cum = keyed_prefix_sum(docs, "doc_id", F.col("n"), out="start")
    b = F.lit(_PACK_BUDGET)
    spanned = cum.select(
        "doc_id",
        "n",
        "start",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / b),
                F.floor((F.col("start") + F.col("n") - 1) / b),
            )
        ).alias("seq_id"),
    )
    return spanned.select(
        "doc_id",
        "seq_id",
        (
            F.least((F.col("seq_id") + 1) * b, F.col("start") + F.col("n"))
            - F.greatest(F.col("seq_id") * b, F.col("start"))
        ).alias("n_tokens"),
    )


_QWS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, n_tokens, u
FROM (
  SELECT doc_id, lang, n_tokens,
         {_md5_uniform_sql('qws', 'doc_id')} AS u
  FROM tok
)
WHERE u < least(1.0, n_tokens / 40.0)
"""


@query("quality_weighted_sample", oracle=_QWS_ORACLE)
def quality_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic quality-weighted subsampling: keep each doc with
    probability p = min(1, n_tokens/40) — longer docs survive, short
    ones are thinned — using the portable md5 uniform instead of
    rand(), so the SAME rows are kept on any engine, any partitioning,
    any cluster size (reproducible corpus builds are a hard
    requirement for training pipelines).  Single scan, map-side
    filter, no shuffle at all."""
    docs = t(spark, sf, "documents").select(
        "doc_id", "lang", F.size(_tokens("text")).alias("n_tokens")
    )
    u = _md5_uniform("qws", F.col("doc_id"))
    return docs.withColumn("u", u).filter(
        F.col("u") < F.least(F.lit(1.0), F.col("n_tokens") / F.lit(40.0))
    )


_MIX_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_md5_uniform_sql('mix', 'doc_id')}, doc_id
         ) AS rk
  FROM documents
), floor_n AS (
  SELECT min(cnt) AS m FROM (
    SELECT count(*) AS cnt FROM documents GROUP BY source
  )
)
SELECT doc_id, source FROM ranked, floor_n WHERE rk <= m
"""


@query("source_mixture_balance", oracle=_MIX_ORACLE)
def source_mixture_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Source-mixture balancing: downsample every source to the size
    of the SMALLEST source (equal-weight mixture), choosing survivors
    by the portable md5 uniform so the selection is deterministic and
    engine-independent.

    Scale (r06, window-funnel lint): selecting "the m lowest-u rows
    per source" no longer ranks each source's full row set inside one
    window partition.  The uniform is binned into 4096 fixed ranges;
    per-(source, bin) counts feed a window over the tiny bin table
    only, giving each bin's exclusive rank base, and the per-row
    rank window is partitioned by (source, BIN) — 4096-way parallel
    per source with ~n/4096 rows of state per task — with global rank
    = base + local rank (the equal_freq_bucket two-phase discipline
    with row count as the contribution)."""
    nbins = 4096
    docs = t(spark, sf, "documents").select(
        "doc_id",
        "source",
        _md5_uniform("mix", F.col("doc_id")).alias("u"),
    ).withColumn("bin", F.floor(F.col("u") * nbins).cast("long"))
    # persisted: the bin table (sources x 4096 rows, value-bounded) is
    # read twice (floor count + rank bases) — without the cache each
    # reference re-scans the corpus (FileScan budget lint)
    bcnt = docs.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).persist()
    floor_n = bcnt.groupBy("source").agg(F.sum("cnt").alias("n")).agg(
        F.min("n").cast("long").alias("m")
    )
    wb = W.partitionBy("source").orderBy("bin").rowsBetween(
        W.unboundedPreceding, -1
    )
    bbase = bcnt.join(F.broadcast(floor_n)).select(
        "source",
        "bin",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0))
        .cast("long")
        .alias("base"),
        "cnt",
        "m",
    )
    wl = W.partitionBy("source", "bin").orderBy("u", "doc_id")
    return (
        docs.join(F.broadcast(bbase), ["source", "bin"])
        .withColumn("rk", F.col("base") + F.row_number().over(wl))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "source")
    )


_SHARDS = 8

_SHUF_ORACLE = f"""
SELECT doc_id, shard_id,
       row_number() OVER (
         PARTITION BY shard_id ORDER BY u, doc_id
       ) AS pos
FROM (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('shard:',
           CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % {_SHARDS}
           AS shard_id,
         {_md5_uniform_sql('pos', 'doc_id')} AS u
  FROM documents
)
"""


@query("global_shuffle_shard", oracle=_SHUF_ORACLE)
def global_shuffle_shard(spark: SparkSession, sf: str) -> DataFrame:
    """The global training shuffle: every doc gets a deterministic
    pseudo-random shard (md5 % 8) and a position within its shard
    (rank of a second independent md5 uniform) — the exact output
    layout a dataloader consumes, reproducible across engines and
    cluster sizes.  This IS a full repartition of the corpus (that is
    the point of a global shuffle), but it is ONE shuffle on the
    shard key and the per-shard rank window runs partition-parallel;
    shard count scales with the corpus, keeping windows bounded."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    docs = t(spark, sf, "documents").select(
        "doc_id",
        (h % _SHARDS).alias("shard_id"),
        _md5_uniform("pos", F.col("doc_id")).alias("u"),
    )
    pos = F.row_number().over(
        W.partitionBy("shard_id").orderBy("u", "doc_id")
    )
    return docs.select("doc_id", "shard_id", pos.alias("pos"))


# ---------------------------------------------------------------------------
# Span-level duplication (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better"): repeated fixed-width token spans are
# the unit that inflates memorization, not whole-document copies.
# ---------------------------------------------------------------------------

_SPAN_W = 16  # tokens per span (non-overlapping)


def _span_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, source, h): md5 of each non-overlapping 16-token span.
    Linear fan-out (tokens/16 rows per doc); the span text is built
    with slice+concat_ws inside codegen, hashed once."""
    ws = _tokens(F.col("text"), lowercase=True)
    # guard BEFORE sequence(): Spark's sequence(0, stop) DESCENDS when
    # stop < 0, so a <16-token doc would fabricate spans instead of
    # producing none
    return (
        docs.withColumn("ws", ws)
        .filter(F.size("ws") >= _SPAN_W)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.floor(F.size("ws") / _SPAN_W) - 1).cast("int"),
                    ),
                    lambda c: F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("ws"), c * _SPAN_W + 1, _SPAN_W)
                        )
                    ),
                )
            ).alias("h"),
        )
    )


@query(
    "dup_span_detect",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS ws
      FROM documents),
    ch AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(ws, c * {_SPAN_W} + 1, c * {_SPAN_W} + {_SPAN_W}),
               ' ')) AS h
      FROM toks, unnest(range(0, len(ws) // {_SPAN_W})) AS u(c)),
    cnt AS (SELECT h, count(*) AS n FROM ch GROUP BY h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans
    FROM ch JOIN cnt USING (h)
    GROUP BY doc_id
    """,
)
def dup_span_detect(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document duplicated-span census: hash every non-overlapping
    16-token span, count corpus-wide occurrences, and report how many
    of each doc's spans appear more than once anywhere (incl. within
    the same doc).  This is the detection pass of exact-substring
    dedup at span granularity — the Lee-et-al operator whole-document
    fingerprinting misses (docs that share boilerplate paragraphs but
    differ elsewhere).  Scale: fan-out is tokens/16 rows; the span
    counts aggregate with map-side combine to the distinct-span space;
    one hash-keyed shuffle joins counts back; nothing is quadratic and
    no span text survives past the md5."""
    ch = _span_chunks(t(spark, sf, "documents"))
    cnt = ch.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    return (
        ch.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum((F.col("n") > 1).cast("long")).cast("long").alias(
                "n_dup_spans"
            ),
        )
    )


@query(
    "span_cross_source_leakage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS ws
      FROM documents),
    ch AS (
      SELECT doc_id, source,
             md5(array_to_string(
               list_slice(ws, c * {_SPAN_W} + 1, c * {_SPAN_W} + {_SPAN_W}),
               ' ')) AS h
      FROM toks, unnest(range(0, len(ws) // {_SPAN_W})) AS u(c))
    SELECT h,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM ch
    GROUP BY h
    HAVING count(DISTINCT source) >= 2
    """,
)
def span_cross_source_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus contamination detector: token spans that appear in
    two or more distinct `source` corpora — the signal behind
    benchmark-leakage audits and license-laundering checks (a span
    that shows up in both a crawl slice and a curated eval source is
    exactly what decontamination must catch).  Whole-document
    fingerprints find nothing here (zero exact dups across sources in
    the synthetic corpus); span granularity does.  Scale: same
    linear span fan-out as dup_span_detect; the aggregate is
    hash-keyed with map-side distinct on (h, source) bounded by the
    source count, and only multi-source hashes survive the HAVING."""
    ch = _span_chunks(t(spark, sf, "documents"))
    return (
        ch.groupBy("h")
        .agg(
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_sources") >= 2)
    )


@query(
    "source_temperature_weights",
    oracle="""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs, n_chars,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
      FROM g),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
    SELECT source, n_docs, n_chars, w AS weight,
           (w * 1000000) // tot.tw AS share_e6
    FROM w CROSS JOIN tot
    """,
)
def source_temperature_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-T=2 mixture reweighting: sampling weight per source
    ∝ n_docs^(1/2) — the standard upweight-the-tail recipe (multilingual
    / multi-source pretraining samples source s with p_s ∝ n_s^(1/T))
    alongside the equal-weight floor of source_mixture_balance.  The
    only transcendental is sqrt, which IEEE 754 requires CORRECTLY
    ROUNDED — unlike ln/exp/pow it is bit-identical across libms — and
    it is floor()ed to an integer weight anyway; shares are exact
    BIGINT-multiply-integer-divide e6 ticks.  Scale: one map-side
    combinable aggregate to source cardinality, then scalar
    arithmetic with a 1-row broadcast total."""
    g = (
        t(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    w = g.withColumn(
        "weight",
        F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long"),
    )
    # total via a window over the SOURCE-CARDINALITY aggregate (tiny,
    # reduced input — lint-clean), not a second corpus scan
    tw = F.sum("weight").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ).cast("long")
    return w.withColumn("tw", tw).select(
        "source",
        "n_docs",
        "n_chars",
        "weight",
        F.expr("(weight * 1000000) div tw").alias("share_e6"),
    )
