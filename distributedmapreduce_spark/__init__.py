"""PySpark-native analytics engine with the query/data-processing
capabilities of ParitoshSabade/DistributedMapReduce, rebuilt Spark-first.

The reference (read-only at /root/reference) is a distributed MapReduce
framework with two packaged jobs: word count and inverted index
(word -> byte offsets).  This engine reproduces that surface as
DataFrame pipelines (see ``operators.text``), generalizes the
mapper/reducer programming model (``operators.mapreduce``), and adds
the full relational + LLM-data-pipeline operator surface declared in
SURVEY.md §2 / §7 (joins, aggregations, windows, set ops, dedup,
similarity search, text analysis, multimodal columns, streaming).

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
