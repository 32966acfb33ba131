"""Explicit StructTypes for the engine's core tables.

The reference is duck-typed (dict/Counter structures, see
/root/reference/nama/match_data.py:21-23); we pin explicit schemas. Five core
tables per SURVEY.md §1:

- RECORDS: the north-rule input (Iceberg-shaped source-code repo table).
- MATCHDATA: a partition of a string universe (match_data.py:580-611 CSV form).
- EMBEDDINGS: string → unit vector (embedding_similarity/embeddings.py:14-32).
- TOKENS: exploded tokenizer output (token_similarity docs: tokenized/doc_counts).
- EDGES: scored candidate pairs — the engine's central first-class table.
- LINEAGE: per-stage / per-partition metrics rows for resumability.
"""

from __future__ import annotations

from pyspark.sql import types as T

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

MATCHDATA_SCHEMA = T.StructType(
    [
        T.StructField("string", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("group", T.StringType(), False),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("string", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("vec", T.ArrayType(T.FloatType(), False), False),
    ]
)

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("string", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("block_key", T.StringType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("iteration", T.IntegerType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("rows", T.LongType(), True),
        T.StructField("metric", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("checkpoint", T.StringType(), True),
    ]
)
