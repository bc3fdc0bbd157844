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


def _term_counts_udtf():
    """Python UDTF (Spark 4 user-defined TABLE function): one input row
    → many output rows, here per-document term frequencies. Built
    lazily for the same session-parsing reason as the pandas UDF."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, n bigint")
    class TermCounts:
        def eval(self, text: str):
            from collections import Counter

            for term, n in sorted(Counter((text or "").split(" ")).items()):
                yield term, n

    return TermCounts


@register(
    "udf_table_function",
    oracle="""
    SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY 1, 2
    """,
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a correlated LATERAL join: each document row fans
    out to its (term, count) rows — the UDTF analogue of
    explode+groupBy, with the per-row expansion logic in Python.
    Plan shape: BatchEvalPythonUDTF fused after the scan, no shuffle
    (the fan-out is per-row); the relational rewrite on the oracle side
    is the exact same result from pure SQL. Like every Python-path op
    here, this exists to prove the API surface — the JVM-side
    explode+groupBy (text_repetition_stats) is the scale path."""
    docs = load_table(spark, "documents", sf_dir)
    spark.udtf.register("term_counts", _term_counts_udtf())
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.term, t.n FROM _udtf_docs d, LATERAL term_counts(d.text) t"
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           upper(substr(lang, 1, 2)) AS lang_uc
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED regular Python UDF (`useArrow=True`, Spark 4):
    row-function ergonomics (plain str -> value, no pandas Series
    handling) with Arrow-batched transfer underneath — the migration
    path for legacy row UDFs that can't be rewritten as vectorized
    pandas_udfs. Still Python-per-row compute, so the engine reserves
    it for non-hot-path logic; the oracle is the relational rewrite."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def n_chars(s: str) -> int:
        return len(s)

    @udf("string", useArrow=True)
    def lang_uc(s: str) -> str:
        return s[:2].upper()

    d = load_table(spark, "documents", sf_dir)
    return d.select("doc_id", n_chars("text").alias("n_chars"), lang_uc("lang").alias("lang_uc"))


@register(
    "udf_grouped_arrow",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(n_chars) - min(n_chars) AS BIGINT) AS char_range
    FROM documents GROUP BY source
    """,
)
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map `applyInArrow` (Spark 4): each group arrives as ONE
    pyarrow.Table — zero-copy columnar, no pandas materialization —
    the lowest-overhead custom-group-logic path (completing the Arrow
    UDF matrix beside pandas_udf / applyInPandas / mapInPandas /
    mapInArrow). Integer-only outputs keep the oracle hash-safe; the
    per-group-fits-in-memory caveat applies as with any grouped map."""
    import pyarrow as pa

    def stats(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = table.num_rows
        chars = table.column("n_chars")
        total = pc.sum(chars).as_py() or 0
        rng = (pc.max(chars).as_py() or 0) - (pc.min(chars).as_py() or 0)
        return pa.Table.from_pydict(
            {
                "source": [table.column("source")[0].as_py()],
                "n_docs": [n],
                "total_chars": [total],
                "char_range": [rng],
            }
        )

    from bigdata06_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    d = load_table(spark, "documents", sf_dir).select("source", "n_chars")
    return d.groupBy("source").applyInArrow(
        stats, schema="source string, n_docs long, total_chars long, char_range long"
    )
