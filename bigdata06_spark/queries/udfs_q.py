"""Python UDF surface (SURVEY.md §2.B "UDF surface"): the two Arrow
paths — scalar `@pandas_udf` (vectorized columnar batches) and
grouped-map `applyInPandas` (whole-group pandas frames) — each with an
exact relational oracle. `mapInPandas` is exercised by
`multimodal_decode` and the Spotify batch fetch;
`applyInPandasWithState` by `stream_stateful_running`.

UDFs are the slow path (ship columns to Python, compute, ship back) —
these exist to prove the surface works and to host logic Spark can't
express (the multimodal decoders); everything else in this repo stays
JVM-side on principle. Both UDFs here compute only exact
(string/integer/day) results so the oracle hash-match is safe —
float-accumulating UDFs would hit cross-engine sum-order divergence.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.queries import register


def _normalize_text_udf():
    """Vectorized text canonicalization: lowercase, strip punctuation,
    collapse whitespace — one Arrow batch in, one out. Built lazily:
    the pandas_udf decorator parses its DDL return type against the
    active session, so it can't run at import time."""

    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return (
            s.str.lower()
            .str.replace(r"[^\w\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )

    return normalize


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9_ \t\n]', '', 'g'),
                               '[ \t\n]+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: Arrow-batched text normalization over
    documents. Plan shape: ArrowEvalPython stage fused into the scan
    projection — no shuffle, batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", _normalize_text_udf()(F.col("text")).alias("norm_text"))


def _order_history(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-customer order timeline: sequence number and whole days since
    the previous order (deterministic sort: date then key)."""
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
    pdf["seq"] = range(1, len(pdf) + 1)
    pdf["days_since_prev"] = pdf["o_orderdate"].diff().dt.days.astype("float64")
    return pdf[["o_custkey", "o_orderkey", "seq", "days_since_prev"]]


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS seq,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS DOUBLE)
             AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each customer's complete order history
    arrives as ONE pandas frame (sorted locally, sequence + day gaps
    computed imperatively). One shuffle on the group key — identical to
    a window aggregation's distribution, but the per-group logic is
    arbitrary Python. Skew caveat at 100 TB: the whole group must fit
    in one task's memory (fine for per-customer groups; NOT for
    per-nation)."""
    o = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_orderdate")
    return o.groupBy("o_custkey").applyInPandas(
        _order_history, "o_custkey long, o_orderkey long, seq long, days_since_prev double"
    )
