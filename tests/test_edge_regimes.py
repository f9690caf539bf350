"""Edge-regime locks for the ADVICE r04 fixes — synthetic corpora that
drive regimes the driver testdata never hits:

- curation_pipeline_v3 with a FULLY COLLAPSING stage (the audit's
  whole purpose): every stage id must still emit a row, with zeros.
- window_rank_battery with a single-row group: percent_rank must be a
  pinned 0, not Spark NaN→0-cast vs DuckDB NULL divergence.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_table(spark, df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_curation_v3_emits_rows_for_collapsed_stages(spark, tmp_path):
    """10-token/1-distinct docs fail the type-token quality gate, so
    stages 'quality' and 'budget' survive ZERO docs — the r04 inner
    theta-join silently dropped those audit rows; the left-join fix
    must emit (stage, 0, 0) for each."""
    from distributedmapreduce_spark.plans import curation as C
    from distributedmapreduce_spark.plans.registry import QUERIES

    docs = spark.createDataFrame(
        [(i, "a a a a a a a a a a") for i in range(5)], "doc_id long, text string"
    )
    _write_table(spark, docs, tmp_path, "documents")
    rows = sorted(
        QUERIES["curation_pipeline_v3"](spark, str(tmp_path)).collect(),
        key=lambda r: r.stage_id,
    )
    assert [r.stage for r in rows] == list(C._P3_STAGES)  # no row lost
    assert rows[0].n_docs == 5
    # exact dedup keeps one copy of the identical text
    assert rows[2].n_docs == 1
    # the quality gate collapses the corpus: trailing stages are (0, 0)
    collapsed = [r for r in rows if r.n_docs == 0]
    assert collapsed, "expected at least one fully-collapsed stage"
    for r in collapsed:
        assert r.n_tokens == 0


def test_window_rank_battery_singleton_group(spark, tmp_path):
    """A single-row event_type group: (rnk-1)/(n-1) is 0/0 — Spark
    floor(NaN)→0 under non-ANSI, NULL in DuckDB (and an error under
    ANSI).  The r05 guard pins percent_rank_e6 = 0 on both engines."""
    from distributedmapreduce_spark.plans.registry import QUERIES

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    types = [r[0] for r in ev.select("event_type").distinct().limit(2).collect()]
    singleton_id = ev.filter(F.col("event_type") == types[0]).agg(
        F.min("event_id")
    ).collect()[0][0]
    subset = ev.filter(
        (F.col("event_type") == types[1])
        | (F.col("event_id") == singleton_id)
    )
    _write_table(spark, subset, tmp_path, "events")
    rows = QUERIES["window_rank_battery"](spark, str(tmp_path)).collect()
    single = [r for r in rows if r.event_type == types[0]]
    assert len(single) == 1
    assert single[0].percent_rank_e6 == 0
    assert single[0].rnk == 1 and single[0].cume_ub_e6 == 1_000_000
