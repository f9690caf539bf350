"""Similarity-search extensions: kNN classification over embeddings
and TF-IDF document ranking (the retrieval-ish workloads an
LLM-data pipeline runs next to dedup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine as _cosine
from .core import query, t


@query(
    "knn_classify",
    oracle="""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
    corpus AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id >= 20),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label, c.label AS neighbor_label,
             c.vec_id AS neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
               AS cosine
      FROM q JOIN corpus c ON true),
    top5 AS (
      SELECT query_id, true_label, neighbor_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored) WHERE rn <= 5),
    votes AS (
      SELECT query_id, true_label, neighbor_label, count(*) AS votes
      FROM top5 GROUP BY query_id, true_label, neighbor_label)
    SELECT query_id, true_label, neighbor_label AS predicted_label FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, neighbor_label) AS rn
      FROM votes) WHERE rn = 1
    """,
)
def knn_classify(spark: SparkSession, sf: str) -> DataFrame:
    """5-NN majority-vote label prediction for query vectors
    (vec_id < 20) against the rest of the corpus; ties broken by
    smallest label.  Query side broadcast — corpus never shuffles."""
    emb = t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )
    corpus = emb.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        "embedding",
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "neighbor_label",
        "neighbor_id",
        _cosine(F.col("q_emb"), F.col("embedding")).alias("cosine"),
    )
    w_rank = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    top5 = scored.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") <= 5
    )
    votes = top5.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w_vote = W.partitionBy("query_id").orderBy(
        F.desc("votes"), "neighbor_label"
    )
    return (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").alias("predicted_label"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf, rn
    FROM (
      SELECT tf.doc_id, tf.word,
             tf.tf, df.df, n.n_docs,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                         tf.word) AS rn
      FROM tf JOIN df USING (word) CROSS JOIN n)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms.  The document-frequency side is
    a word-level aggregate broadcast back onto the term stream — two
    shuffles total (tf groupBy, df groupBy), no joins on the raw
    corpus."""
    docs = t(spark, sf, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        ).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    tfidf = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    w = W.partitionBy("doc_id").orderBy(F.desc(tfidf), "word")
    return (
        tf.join(F.broadcast(df), "word")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", F.round(tfidf, 6).alias("tfidf"), "rn")
    )


@query("ann_ivf_topk", oracle=None)  # float reduction order -> rows-only
def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate NN: K=16 inverted lists, nprobe=4.

    Index build is fully distributed DataFrame code: deterministic
    seed centroids (the K lowest vec_ids), one Lloyd refinement
    (assign via broadcast argmin with min_by, re-average per cluster
    by exploding components), centroids rounded to 6dp to absorb
    float reduction-order jitter.  Queries probe their 4 nearest
    centroids and run exact cosine only inside those lists — the
    corpus shuffles once (on cluster id), never pairwise.  Same
    output schema as cosine_topk_bruteforce so recall is directly
    comparable."""
    from ..functions.vector import dot as _dot, l2_norm as _norm

    emb = t(spark, sf, "embeddings").select("vec_id", "embedding")
    k_lists, n_probe, top_k = 16, 4, 5

    seeds = emb.filter(F.col("vec_id") < k_lists).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").alias("c_emb"),
    )

    def nearest(vectors: DataFrame, centroids: DataFrame, n: int) -> DataFrame:
        """n nearest centroids per vector by cosine (broadcast K rows)."""
        scored = vectors.join(F.broadcast(centroids)).select(
            "vec_id",
            "embedding",
            "cluster",
            (
                _dot(F.col("embedding"), F.col("c_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("c_emb")))
            ).alias("sim"),
        )
        if n == 1:
            return scored.groupBy("vec_id").agg(
                F.min_by("cluster", -F.col("sim")).alias("cluster"),
                F.first("embedding").alias("embedding"),
            )
        w = W.partitionBy("vec_id").orderBy(F.desc("sim"), "cluster")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= n)
            .select("vec_id", "embedding", "cluster")
        )

    # one Lloyd iteration: average the members of each seed cluster
    assigned0 = nearest(emb, seeds, 1)
    refined = (
        assigned0.select("cluster", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c_emb")
        )
    )
    # materialize the index-build artifact (K x dim floats): the
    # centroid lineage is a full corpus pass, and without this it
    # would re-execute for the list assignment AND the query probes.
    # This is the IVF build/search split — at scale the centroids
    # would be persisted next to the index.
    centroids = spark.createDataFrame(
        refined.collect(), schema="cluster int, c_emb array<double>"
    )

    lists = nearest(emb, centroids, 1)  # inverted lists: vec -> cluster
    probes = nearest(
        emb.filter(F.col("vec_id") < 10), centroids, n_probe
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "cluster",
    )
    scored = (
        lists.join(probes, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
                4,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= top_k
    )
