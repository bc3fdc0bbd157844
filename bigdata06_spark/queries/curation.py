"""Corpus-curation queries beyond the dedup/quality basics: benchmark
decontamination, PII redaction, canonical-representative selection after
dedup clustering, and vocabulary building.

These are the remaining standard stages of a training-data pipeline
(SURVEY.md §2.B north star). All stay in codegen'd Column expressions;
the only shuffles are the key-partitioned aggregations each stage
fundamentally needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.operators import dedup as D
from bigdata06_spark.operators import textops as T
from bigdata06_spark.queries import register
from bigdata06_spark.queries.qutil import rnd, rnd_sql

# 5-word shingles for decontamination (eval-overlap wants longer, rarer
# n-grams than the 3-gram dedup shingles).
_SHINGLES5_CTE = """
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([array_to_string(ws[i:i+4], ' ')
                                        for i in range(1, len(ws) - 3)])) AS shingle
           FROM w)
"""


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH {_SHINGLES5_CTE},
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM sh s JOIN ev USING (shingle)
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-gram with the held-out eval slice (doc_id % 97 — the stand-in for
    a benchmark suite), reporting the distinct overlapping-shingle
    count per contaminated doc.

    Scale shape: the eval side is tiny by construction (benchmarks are
    KBs, corpora are TBs), so its distinct shingles BROADCAST and the
    training-side explode never shuffles — one scan + one map-side hash
    join + one groupBy on the (few) contaminated doc_ids. The naive
    shuffle-join on shingle keys would move the entire exploded corpus.
    """
    docs = load_table(spark, "documents", sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(T.distinct_shingles(T.words(F.col("text")), 5)).alias("shingle"),
    )
    ev = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PHONE_RE = "\\b\\d{3}-\\d{4}\\b"
_URL_RE = "https?://[^\\s]+"


@register(
    "text_redact_pii",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                     THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' see https://example.com/d/' || doc_id ELSE '' END
               AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{_URL_RE}', '<URL>', 'g'),
             '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones
    FROM raw
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub emails / phone numbers / URLs to typed
    placeholder tokens and count each redaction class per document.

    The synthetic corpus contains no PII, so the query deterministically
    injects it first (email for doc_id%3, phone for %4, URL for %5) —
    the redaction path is exercised on both matching and non-matching
    rows and stays fully oracle-checked. URL is scrubbed before email
    (a URL can embed '@'); patterns are common-subset Java/RE2 regex.

    Scale shape: pure per-row regexp_replace in one projection — no
    shuffle, embarrassingly parallel over the scan, exactly what a
    scrub pass must be at 100 TB.
    """
    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id").cast("string")
    raw = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), d, F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" see https://example.com/d/"), d),
        ).otherwise(F.lit("")),
    )
    t = F.col("t")

    def n_matches(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    return docs.select("doc_id", raw.alias("t")).select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, _URL_RE, "<URL>"),
                _EMAIL_RE,
                "<EMAIL>",
            ),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        n_matches(_URL_RE).alias("n_urls"),
        n_matches(_EMAIL_RE).alias("n_emails"),
        n_matches(_PHONE_RE).alias("n_phones"),
    )


@register(
    "dedup_keep_canonical",
    oracle="""
    WITH RECURSIVE
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([array_to_string(ws[i:i+2], ' ')
                                        for i in range(1, len(ws) - 1)])) AS shingle
           FROM w),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
    ),
    e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
    comp(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, c.label FROM comp c JOIN e ON e.src = c.node
    ),
    assign AS (SELECT node AS doc_id, min(label) AS component FROM comp GROUP BY node),
    st AS (
      SELECT a.doc_id, a.component,
             CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS ntok
      FROM assign a JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT doc_id, component, ntok,
             row_number() OVER (PARTITION BY component ORDER BY ntok DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY component) AS n_members
      FROM st
    )
    SELECT doc_id, component, ntok, CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster: after connected components over the exact
    near-dup graph (3-gram Jaccard ≥ 0.5), keep the canonical document
    per component — most tokens wins, ties to min doc_id — with the
    member count it now represents. This is the decision step that
    turns pairwise dedup output into the filtered corpus.

    Scale shape: the component labels join back to per-doc stats on
    doc_id (co-partitioned with the label propagation's own shuffles),
    then one window over component keys — components are near-uniform
    (dup clusters are small), so no skew; the window adds a single
    shuffle over |docs| rows of 3 columns, not the full text.
    """
    docs = load_table(spark, "documents", sf_dir)
    comps = D.connected_components(D.jaccard_pairs(docs, threshold=0.5), docs)
    stats = docs.select("doc_id", T.regex_token_count(F.col("text")).alias("ntok"))
    w = Window.partitionBy("component")
    ranked = (
        comps.join(stats, "doc_id")
        .withColumn("rn", F.row_number().over(w.orderBy(F.desc("ntok"), F.asc("doc_id"))))
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
    )
    return ranked.filter(F.col("rn") == 1).select("doc_id", "component", "ntok", "n_members")


@register(
    "text_vocabulary",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    st AS (
      SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
    ),
    r AS (
      SELECT term, cf, df,
             row_number() OVER (ORDER BY cf DESC, term ASC) AS rn,
             sum(cf) OVER (ORDER BY cf DESC, term ASC ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cf) OVER () AS total
      FROM st
    )
    SELECT term, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
           CAST(rn AS BIGINT) AS rn,
           {rnd_sql('CAST(cum AS DOUBLE) / total', 6)} AS cum_share
    FROM r WHERE rn <= 100
    """,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-100 terms by collection frequency with
    document frequency and cumulative corpus-coverage share — the
    tokenizer-training / stopword-discovery primitive.

    Scale shape: ONE corpus scan. The explode feeds a (term)-keyed
    aggregation (Catalyst rewrites the count-distinct as a two-level
    (term, doc_id) → (term) agg, both map-side-combining); everything
    after runs on the |vocab|-sized relation (≪ corpus — Heaps' law),
    so the single-partition rank/cumsum window is over thousands of
    rows, not the 100 TB token stream. The total token count comes from
    a whole-partition frame in the SAME window node — a second
    scan+explode of the corpus (or a cross-joined global agg) just to
    get the denominator would double the dominant cost.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("term"))
    st = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.count_distinct(F.col("doc_id")).alias("df"),
    )
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    r = (
        st.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum", F.sum("cf").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        .withColumn(
            "total",
            F.sum("cf").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)),
        )
    )
    return r.filter(F.col("rn") <= 100).select(
        "term",
        F.col("cf").cast("long").alias("cf"),
        F.col("df").cast("long").alias("df"),
        F.col("rn").cast("long").alias("rn"),
        rnd(F.col("cum").cast("double") / F.col("total"), 6).alias("cum_share"),
    )


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    st AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
    r AS (
      SELECT floor(ln(CAST(row_number() OVER (ORDER BY cf DESC, term ASC)
                           AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS lx,
             floor(ln(CAST(cf AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ly
      FROM st
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(lx AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(lx * lx AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(lx * ly AS DECIMAL(38,12))) AS DOUBLE) AS sxy
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           {rnd_sql('-((n * sxy - sx * sy) / (n * sxx - sx * sx))', 6)}
             AS zipf_exponent,
           {rnd_sql('(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n', 6)}
             AS log_intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(frequency)
    on ln(rank) → the Zipf exponent s (natural text ≈ 1; a synthetic
    or boilerplate-heavy corpus drifts far from it) and the
    log-intercept — the corpus-statistics health check run before
    tokenizer training (a degenerate exponent flags template spam the
    dedup pass should have caught).

    Scale shape: ONE corpus scan feeds the (term)-keyed count (map-side
    combined); the rank window and the 5-sum OLS aggregate run on the
    |vocab|-sized relation (Heaps' law: ≪ corpus). Determinism: each
    log is 6dp-quantized per term BEFORE the decimal power sums
    (order-independent exact addition), and the closed-form normal
    equations are a shared 6dp-rounded expression tree — the
    `orders_trend_ols` recipe applied to transcendental inputs."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(T.words(F.col("text"))).alias("term"))
    st = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    r = st.withColumn("rn", F.row_number().over(w)).select(
        rnd(F.log(F.col("rn").cast("double")), 6).alias("lx"),
        rnd(F.log(F.col("cf").cast("double")), 6).alias("ly"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("lx").cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum(F.col("ly").cast("decimal(25,6)")).cast("double").alias("sy"),
        F.sum((F.col("lx") * F.col("lx")).cast("decimal(38,12)"))
        .cast("double").alias("sxx"),
        F.sum((F.col("lx") * F.col("ly")).cast("decimal(38,12)"))
        .cast("double").alias("sxy"),
    )
    s.createOrReplaceTempView("_zipf_sums")
    return spark.sql("""
        SELECT CAST(n AS BIGINT) AS n_terms,
               floor(-((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6 + 0.5)
                 / 1e6 AS zipf_exponent,
               floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                     * 1e6 + 0.5) / 1e6 AS log_intercept
        FROM _zipf_sums
    """)


@register(
    "corpus_split_assign",
    oracle="""
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                  % 1000 AS BIGINT) AS bucket,
           CASE
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 1000 < 800 THEN 'train'
             WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 1000 < 900 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first 32 bits
    of md5(doc_id) mod 1000, split at 800/900. The property that makes
    this THE standard split mechanism for training corpora: membership
    is a pure function of the stable id — re-runs, backfills, and
    late-arriving shards land in the same split with no coordination,
    unlike rand()-based sampling. Zero shuffles: the whole assignment
    is a scan-stage expression; writing the three splits is a
    partitionBy('split') sink away."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test").alias("split"),
    )


def _leakage_safe_oracle() -> str:
    from bigdata06_spark.queries.llm import _COMPONENTS_SQL

    bucket = ("CAST(CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8))"
              " AS UBIGINT) % 1000 AS BIGINT)")
    return f"""
    WITH labeled AS ({_COMPONENTS_SQL})
    SELECT doc_id, component,
           {bucket} AS bucket,
           CASE WHEN {bucket} < 800 THEN 'train'
                WHEN {bucket} < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM labeled
    """


@register("corpus_split_leakage_safe", oracle=_leakage_safe_oracle())
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment: the split key is the
    near-duplicate COMPONENT id (connected components over the exact
    J ≥ 0.5 pair graph), not the doc id — so a document and its
    near-duplicates always land in the SAME split. Hash-splitting raw
    doc ids (corpus_split_assign) silently puts one copy of a dup pair
    in train and the other in test, leaking training text into eval —
    the contamination class Lee et al.'s dedup paper measures.
    Deterministic like the plain split (pure function of the stable
    component label, same md5-bucket recipe), so backfills and re-runs
    agree with no coordination.

    Scale shape: the component labeling is the dedup family's budget
    (banded LSH pairs + O(log n)/O(diameter) label propagation on the
    24-byte (id, label) relation); the split itself is a scan-stage
    expression over that labeling — no extra shuffle beyond dedup
    output the pipeline already computes."""
    docs = load_table(spark, "documents", sf_dir)
    comps = D.connected_components(D.jaccard_pairs(docs, threshold=0.5), docs)
    bucket = (
        F.conv(F.substring(F.md5(F.col("component").cast("string")), 1, 8),
               16, 10).cast("long") % 1000
    )
    return comps.select(
        "doc_id",
        "component",
        bucket.alias("bucket"),
        F.when(bucket < 800, "train").when(bucket < 900, "val")
        .otherwise("test").alias("split"),
    )


@register(
    "corpus_mixture_report",
    oracle="""
    WITH pd AS (
      SELECT source, lang,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS ntok
      FROM documents
    ),
    agg AS (
      SELECT source, lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM pd GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM agg)
    SELECT source, lang, n_docs, n_tokens,
           floor(CAST(n_tokens AS DOUBLE) / total_tokens * 1000000.0 + 0.5) / 1000000.0
             AS token_share
    FROM agg CROSS JOIN tot
    """,
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture report: docs and BPE-ish tokens per
    (source, lang) with each cell's share of total tokens — the mixing
    table a training pipeline reweights against (upsample a source,
    cap a language). One scan, one map-side-combined aggregation to
    |sources×langs| rows; the total broadcasts back as a 1-row cross
    join — never a second corpus pass."""
    docs = load_table(spark, "documents", sf_dir)
    agg = (
        docs.select("source", "lang", T.regex_token_count(F.col("text")).alias("ntok"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").alias("n_tokens"))
    )
    tot = agg.agg(F.sum("n_tokens").alias("total_tokens"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        rnd(F.col("n_tokens").cast("double") / F.col("total_tokens"), 6).alias("token_share"),
    )


@register(
    "corpus_source_kl",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    st AS (SELECT source, term, count(*) AS c_st FROM toks GROUP BY 1, 2),
    x AS (
      SELECT source, term, c_st,
             sum(c_st) OVER (PARTITION BY source) AS t_s,
             sum(c_st) OVER (PARTITION BY term) AS c_t,
             sum(c_st) OVER () AS grand
      FROM st
    ),
    contrib AS (
      SELECT source,
             CAST(floor(CAST(c_st AS DOUBLE) / t_s
                        * ln(CAST(c_st AS DOUBLE) * grand / (CAST(t_s AS DOUBLE) * c_t))
                        * 1e6 + 0.5) / 1e6 AS DECIMAL(25,6)) AS kl6
      FROM x
    )
    SELECT source, CAST(sum(kl6) AS DOUBLE) AS kl_divergence
    FROM contrib GROUP BY 1
    """,
)
def corpus_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    the mixture diagnostic: a high-KL source is lexically unlike the
    rest (a candidate for separate treatment), near-zero means
    redundant with the mix. Term-level contributions round onto the
    6dp grid before the decimal sum (ln ulps + float reassociation),
    and all distribution totals come from windows over the one
    (source, term) count relation — single corpus explode, never a
    second scan."""
    from pyspark.sql import Window

    from bigdata06_spark.queries.qutil import rnd

    d = load_table(spark, "documents", sf_dir)
    toks = d.select("source", F.explode(T.words(F.col("text"))).alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c_st"))
    x = (
        st.withColumn("t_s", F.sum("c_st").over(Window.partitionBy("source")))
        .withColumn("c_t", F.sum("c_st").over(Window.partitionBy("term")))
        .withColumn("grand", F.sum("c_st").over(Window.partitionBy()))
    )
    kl6 = rnd(
        F.col("c_st").cast("double")
        / F.col("t_s")
        * F.log(
            F.col("c_st").cast("double") * F.col("grand") / (F.col("t_s").cast("double") * F.col("c_t"))
        ),
        6,
    ).cast("decimal(25,6)")
    return (
        x.select("source", kl6.alias("kl6"))
        .groupBy("source")
        .agg(F.sum("kl6").cast("double").alias("kl_divergence"))
    )


@register(
    "corpus_temperature_sample",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    m AS (SELECT min(n) AS n_min FROM c),
    r AS (SELECT source, n, sqrt(CAST(n_min AS DOUBLE) / n) AS rate FROM c CROSS JOIN m),
    b AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 1000000 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT b.doc_id, b.source,
           floor(r.rate * 1000000.0 + 0.5) / 1000000.0 AS sample_rate,
           b.bucket < CAST(floor(r.rate * 1000000.0) AS BIGINT) AS kept
    FROM b JOIN r USING (source)
    """,
)
def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 per-source resampling — the standard rebalancing
    step for multi-source training mixes (downsample dominant sources
    toward balance without flattening them): keep rate
    r_s = sqrt(n_min / n_s), so the effective mixture share goes from
    p_s to ∝ p_s^0.5. Membership is a pure function of the stable doc
    id (md5 bucket < r_s·10⁶) — re-runs and backfills agree with no
    coordination, same property as `corpus_split_assign`.

    Cross-engine exactness, by construction rather than tolerance:
    n_min/n_s is one IEEE division and sqrt is correctly rounded, so
    both engines compute the SAME double (no cross-source float sums —
    that's why the rate is anchored to min(n), not a normalized
    Σ p_s^T, which would inherit sum-order divergence); the acceptance
    compare is integer-vs-integer after one floor of that shared
    double.

    Scale: one tiny per-source count aggregate broadcast back onto the
    scan; the per-doc accept is a scan-stage expression — the whole
    resample adds zero fact-table shuffles. Upsampling (rate > 1)
    would replicate via explode(sequence(1, ceil(rate))) + a fractional
    last copy, same determinism trick; this query covers the
    downsample direction the synthetic corpus exercises."""
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.min("n").alias("n_min"))
    r = c.crossJoin(F.broadcast(m)).select(
        "source", F.sqrt(F.col("n_min").cast("double") / F.col("n")).alias("rate")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1000000
    )
    b = d.select("doc_id", "source", bucket.alias("bucket"))
    return b.join(F.broadcast(r), "source").select(
        "doc_id",
        "source",
        rnd(F.col("rate"), 6).alias("sample_rate"),
        (F.col("bucket") < F.floor(F.col("rate") * 1000000.0).cast("long")).alias("kept"),
    )


@register(
    "corpus_epoch_upsample",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    m AS (SELECT max(n) AS n_max FROM c),
    e AS (
      SELECT source, CAST(n_max AS DOUBLE) / n AS epochs,
             CAST(floor(CAST(n_max AS DOUBLE) / n) AS BIGINT) AS whole,
             CAST(floor((CAST(n_max AS DOUBLE) / n - floor(CAST(n_max AS DOUBLE) / n))
                        * 1000000.0) AS BIGINT) AS frac_thresh
      FROM c CROSS JOIN m
    ),
    b AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % 1000000 AS BIGINT) AS bucket
      FROM documents
    ),
    n_cp AS (
      SELECT b.doc_id, b.source,
             e.whole + CASE WHEN b.bucket < e.frac_thresh THEN 1 ELSE 0 END AS n_copies,
             floor(e.epochs * 1000000.0 + 0.5) / 1000000.0 AS epochs
      FROM b JOIN e USING (source)
    )
    SELECT doc_id, source, epochs, CAST(u.copy_idx AS BIGINT) AS copy_idx
    FROM n_cp, unnest(CASE WHEN n_copies > 0
                           THEN [i for i in range(1, CAST(n_copies AS INT) + 1)]
                           ELSE [] END) AS u(copy_idx)
    """,
)
def corpus_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-based upsampling toward source balance — the replication
    counterpart of `corpus_temperature_sample`: every source is
    repeated to match the largest one (epochs e_s = n_max / n_s), with
    whole copies for every doc and the fractional remainder assigned by
    the stable md5 bucket (bucket < frac(e_s)·10⁶ docs get one extra
    copy), so the expected replicated size is n_max per source and
    membership of the extra copy is re-run-stable. This is how
    multi-epoch mixes are materialized for sequence packing — the
    downstream packer sees an explicit (doc, copy_idx) stream, not a
    runtime sampling knob.

    Cross-engine exactness: e_s is one IEEE division (shared double),
    whole/fractional parts via floor on that same double; the
    per-doc accept is integer-vs-integer. Scale: per-source counts are
    a tiny broadcast; replication is explode(sequence(1, n_copies)) —
    row amplification is the OUTPUT size (deliberate), not an
    intermediate blowup, and no fact shuffle is added."""
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.max("n").alias("n_max"))
    epochs = F.col("n_max").cast("double") / F.col("n")
    e = c.crossJoin(F.broadcast(m)).select(
        "source",
        epochs.alias("epochs"),
        F.floor(epochs).cast("long").alias("whole"),
        F.floor((epochs - F.floor(epochs)) * 1000000.0).cast("long").alias("frac_thresh"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1000000
    )
    b = d.select("doc_id", "source", bucket.alias("bucket"))
    n_cp = b.join(F.broadcast(e), "source").select(
        "doc_id",
        "source",
        rnd(F.col("epochs"), 6).alias("epochs"),
        (F.col("whole") + F.when(F.col("bucket") < F.col("frac_thresh"), 1).otherwise(0)).alias(
            "n_copies"
        ),
    )
    return n_cp.select(
        "doc_id",
        "source",
        "epochs",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias("copy_idx"),
    )


@register(
    "corpus_training_manifest",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, lang, text,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ),
    keep AS (
      SELECT * FROM (
        SELECT fp.*, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp
      ) WHERE rn = 1
    ),
    enriched AS (
      SELECT source, lang,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                      % 1000 < 800 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                      % 1000 < 900 THEN 'val'
               ELSE 'test'
             END AS split,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS ntok
      FROM keep
    ),
    grp AS (
      SELECT split, source, lang,
             count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM enriched GROUP BY split, source, lang
    ),
    tot AS (SELECT split, sum(n_tokens) AS split_tokens FROM grp GROUP BY split)
    SELECT g.split, g.source, g.lang, g.n_docs, g.n_tokens,
           floor(CAST(g.n_tokens AS DOUBLE) / t.split_tokens * 1e6 + 0.5) / 1e6
             AS token_share
    FROM grp g JOIN tot t ON g.split = t.split
    """,
)
def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data MANIFEST: the one table a pretraining run is
    configured from — per (split, source, lang): surviving doc count,
    token budget, and within-split token share. Composes the corpus
    pipeline end-to-end in a single plan: exact dedup (keep min-id per
    normalized fingerprint) → deterministic md5-bucket split →
    BPE-ish token pricing → two-level mixture accounting — proving the
    pieces compose, not just pass alone.

    Scale: one fingerprint window (same key as `dedup_exact`'s
    groupBy), then scan-stage split/token expressions, then one
    (split, source, lang) aggregate; the share denominator reuses the
    tiny group relation. No step touches raw text after the first
    aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("fp").orderBy("doc_id")
    keep = (
        docs.select("doc_id", "source", "lang", "text", T.fingerprint_md5("text").alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1000
    )
    enriched = keep.select(
        "source",
        "lang",
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test").alias("split"),
        T.regex_token_count(F.col("text")).alias("ntok"),
    )
    grp = enriched.groupBy("split", "source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").alias("n_tokens")
    )
    tot = grp.groupBy("split").agg(F.sum("n_tokens").alias("split_tokens"))
    from bigdata06_spark.queries.qutil import rnd

    return grp.join(tot, "split").select(
        "split",
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        rnd(F.col("n_tokens").cast("double") / F.col("split_tokens"), 6).alias("token_share"),
    )


@register(
    "corpus_diversity_metrics",
    oracle="""
    WITH tok AS (
      SELECT source,
             CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')))
                  AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(t) AS DOUBLE) AS T, count(*) AS n,
                   CAST(sum(t) AS BIGINT) AS tot_i FROM tok),
    arr AS (SELECT list(t ORDER BY t) AS ts FROM tok),
    pair AS (SELECT CAST(sum(abs(a.t - b.t)) AS BIGINT) AS sad
             FROM tok a CROSS JOIN tok b)
    SELECT tot.n AS n_sources, tot.tot_i AS total_tokens,
           floor(-(list_reduce(list_transform(arr.ts,
               x -> (CAST(x AS DOUBLE) / tot.T) * ln(CAST(x AS DOUBLE) / tot.T)),
               (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS entropy,
           floor(list_reduce(list_transform(arr.ts,
               x -> (CAST(x AS DOUBLE) / tot.T) * (CAST(x AS DOUBLE) / tot.T)),
               (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS simpson,
           floor(CAST(pair.sad AS DOUBLE) / (2 * tot.n * tot.T) * 1e6 + 0.5) / 1e6 AS gini
    FROM tot, arr, pair
    """,
)
def corpus_diversity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-diversity report: Shannon entropy, Simpson index, and
    Gini coefficient of the per-source token distribution — the
    numbers a data-mixture review reads before training (is the corpus
    one source in a trenchcoat?).

    Float determinism for Σ p·ln p (irrational terms — decimal sums
    can't help): fold the contributions over a SORTED ARRAY. Both
    engines evaluate the same left-to-right sequential reduction over
    the same ordered list (`aggregate(transform(...))` / DuckDB
    `list_reduce(list_transform(...))`), so there is no reassociation
    to diverge — a third determinism technique beside decimal sums and
    shared-expression trees. Gini stays in integers (pairwise
    |t_i−t_j| over the tiny source relation) until one final division.
    Scale: everything after the per-source token aggregate operates on
    a |sources|-row relation."""
    docs = load_table(spark, "documents", sf_dir)
    tok = (
        docs.select("source", T.regex_token_count(F.col("text")).alias("_nt"))
        .groupBy("source")
        .agg(F.sum("_nt").alias("t"))
    )
    tot = tok.agg(
        F.sum("t").cast("double").alias("T"),
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("long").alias("tot_i"),
    )
    arr = tok.agg(F.sort_array(F.collect_list("t")).alias("ts"))
    pair = (
        tok.select(F.col("t").alias("ta"))
        .crossJoin(tok.select(F.col("t").alias("tb")))
        .agg(F.sum(F.abs(F.col("ta") - F.col("tb"))).cast("long").alias("sad"))
    )
    combined = tot.crossJoin(arr).crossJoin(pair)
    return combined.selectExpr(
        "n AS n_sources",
        "tot_i AS total_tokens",
        "floor(-(aggregate(transform(ts, x -> (CAST(x AS DOUBLE) / T) * ln(CAST(x AS DOUBLE) / T)), CAST(0 AS DOUBLE), (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS entropy",
        "floor(aggregate(transform(ts, x -> (CAST(x AS DOUBLE) / T) * (CAST(x AS DOUBLE) / T)), CAST(0 AS DOUBLE), (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS simpson",
        "floor(CAST(sad AS DOUBLE) / (2 * n * T) * 1e6 + 0.5) / 1e6 AS gini",
    )
