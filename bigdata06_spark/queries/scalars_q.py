"""Scalar function surface (SURVEY.md §2.B "Scalar fns"): string, date,
math, array, map/json, conditional expression coverage — all built-in
`pyspark.sql.functions` inside whole-stage codegen, no UDFs.

Cross-engine notes: only exactly-rounded IEEE math functions appear in
oracle-checked outputs (sqrt/abs/floor/ceil/mod — libm `log`/`exp`/`pow`
can differ from the JVM in the last ulp); integer-producing functions
are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata06_spark.catalog import load_table
from bigdata06_spark.operators import textops as T
from bigdata06_spark.queries import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           trim(concat('  ', p_type, ' '))                 AS type_trimmed,
           CAST(length(p_name) AS BIGINT)                  AS name_len,
           substr(p_name, 1, 4)                            AS name_head,
           replace(p_type, 'E', '*')                       AS type_replaced,
           regexp_extract(p_name, '([0-9]+)', 1)           AS first_num,
           contains(p_type, 'ECO')                         AS is_eco,
           CAST(levenshtein(p_brand, 'BRAND_1') AS BIGINT) AS brand_dist,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           split_part(p_name, '_', 1)                      AS name_prefix
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: case, trim, length, substring, replace,
    regexp_extract, contains, levenshtein, pad, split_part."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("*")).alias("type_replaced"),
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("first_num"),
        F.contains(F.col("p_type"), F.lit("ECO")).alias("is_eco"),
        F.levenshtein(F.col("p_brand"), F.lit("BRAND_1")).cast("long").alias("brand_dist"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part(F.col("p_name"), F.lit("_"), F.lit(1)).alias("name_prefix"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)     AS yr,
           CAST(month(o_orderdate) AS BIGINT)    AS mo,
           CAST(day(o_orderdate) AS BIGINT)      AS dy,
           CAST(dayofweek(o_orderdate) AS BIGINT) + 1 AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus_30d,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
                                                 AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m-%d')     AS iso_day,
           CAST(quarter(o_orderdate) AS BIGINT)  AS qtr
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage: extract fields, truncation, interval
    arithmetic, date_diff, formatting. Date-typed outputs are formatted
    to ISO strings so both engines hash identically.

    DOW convention: DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday —
    the oracle adds 1 to align (documented divergence)."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch_start"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal)                       AS abs_bal,
           floor(c_acctbal)                     AS floor_bal,
           ceil(c_acctbal)                      AS ceil_bal,
           sqrt(abs(c_acctbal))                 AS sqrt_bal,
           CAST(c_custkey % 7 AS BIGINT)        AS key_mod,
           CASE WHEN c_acctbal > 0 THEN 1.0 WHEN c_acctbal < 0 THEN -1.0 ELSE 0.0 END AS bal_sign,
           greatest(c_acctbal, 0.0)             AS bal_pos,
           least(c_acctbal, 0.0)                AS bal_neg
    FROM customer
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage restricted to exactly-rounded IEEE ops
    (abs/floor/ceil/sqrt/mod/sign/greatest/least) so results are
    bit-identical cross-engine. (log/exp/pow exist in the engine too —
    they're excluded from oracle checks because libm vs JVM can differ
    in the final ulp, not because Spark lacks them.)"""
    c = load_table(spark, "customer", sf_dir)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.floor(bal).cast("double").alias("floor_bal"),
        F.ceil(bal).cast("double").alias("ceil_bal"),
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        (F.col("c_custkey") % 7).cast("long").alias("key_mod"),
        F.when(bal > 0, 1.0).when(bal < 0, -1.0).otherwise(0.0).alias("bal_sign"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(len(words) AS BIGINT)                     AS n_words,
           CAST(len(list_distinct(words)) AS BIGINT)      AS n_distinct_words,
           list_contains(words, 'spark')                  AS has_spark,
           array_to_string(list_sort(list_distinct(words))[1:3], '|') AS first3_sorted,
           CAST(len(list_filter(words, w -> length(w) > 5)) AS BIGINT) AS n_long_words,
           array_to_string(list_transform(words[1:3], w -> upper(w)), ' ') AS head_upper
    FROM w
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage: size, distinct, contains, sort+slice,
    lambda filter, lambda transform — all Catalyst higher-order
    functions, no Python."""
    d = load_table(spark, "documents", sf_dir)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(words)), 1, 3), "|").alias(
            "first3_sorted"
        ),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).cast("long").alias("n_long_words"),
        F.array_join(F.transform(F.slice(words, 1, 3), F.upper), " ").alias("head_upper"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.k')                 AS k_raw,
           json_extract_string(props, '$.missing')           AS missing_field,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events WHERE event_id < 2000
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function coverage: schema-full parse (`from_json`) and
    path extraction (`get_json_object`), including a missing-path NULL.
    At scale prefer from_json once into a struct over repeated
    get_json_object calls (single parse per row)."""
    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), "struct<k:bigint>")
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        F.get_json_object(F.col("props"), "$.k").alias("k_raw"),
        F.get_json_object(F.col("props"), "$.missing").alias("missing_field"),
        (parsed["k"] % 10).alias("k_mod"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'high'
                WHEN o_totalprice >= 200000 THEN 'mid'
                ELSE 'low' END                          AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_mapped,
           (o_orderstatus = 'F' AND o_totalprice > 100000) AS big_finished,
           if(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%', 'urgent', 'normal')
                                                        AS urgency
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression coverage: CASE WHEN bands, nullif/coalesce
    remapping, boolean conjunction column, LIKE-based if()."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 400000, "high")
        .when(F.col("o_totalprice") >= 200000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_mapped"
        ),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)).alias("big_finished"),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), "urgent"
        )
        .otherwise("normal")
        .alias("urgency"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT p_partkey,
           p_brand                                AS brand_v,
           p_type                                 AS type_v,
           CAST(2 AS BIGINT)                      AS n_keys,
           'brand,type'                           AS keys_csv,
           concat(p_brand, ',', p_type)           AS vals_csv,
           TRUE                                   AS has_brand,
           CAST(NULL AS VARCHAR)                  AS missing_v
    FROM part
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY.md §2.B "map"): build a map column with
    create_map, then exercise element_at / try_element_at (missing key →
    NULL, not ANSI error), map_keys / map_values, map_contains_key, and
    size. The map exists only mid-plan — outputs are scalars so the
    oracle (which has no Spark-identical map type) compares plain
    columns computed directly."""
    p = load_table(spark, "part", sf_dir)
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return p.select(
        "p_partkey",
        F.element_at(m, F.lit("brand")).alias("brand_v"),
        F.element_at(m, F.lit("type")).alias("type_v"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), ",").alias("vals_csv"),
        F.map_contains_key(m, F.lit("brand")).alias("has_brand"),
        F.try_element_at(m, F.lit("absent")).alias("missing_v"),
    )


@register(
    "scalar_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity / nullif(l_linenumber - 1, 0)      AS safe_div,
           TRY_CAST(l_returnflag AS INTEGER)             AS flag_as_int,
           strftime(TRY_CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_as_date,
           CASE WHEN l_linenumber >= 1 THEN l_returnflag END AS head_flag
    FROM lineitem
    """,
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe `try_*` surface (Spark 4 runs ANSI mode by default, so
    division by zero / bad casts THROW unless the try_ variants are
    used): try_divide → NULL on zero, try_cast of a non-numeric string
    → NULL (not an error), try_element_at on a guaranteed-present index.
    All stay inside whole-stage codegen."""
    li = load_table(spark, "lineitem", sf_dir)
    arr = F.array(F.col("l_returnflag"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.date_format(F.col("l_shipdate").try_cast("date"), "yyyy-MM-dd").alias("ship_as_date"),
        F.try_element_at(arr, F.lit(1)).alias("head_flag"),
    )


@register(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing_path
    FROM events
    """,
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse_json into a
    VARIANT value, path-extract with variant_get (typed) and
    try_variant_get (missing paths → null, not error). VARIANT keeps
    the parsed tree in a binary form — repeated path extraction skips
    re-parsing the JSON text, the at-scale advantage over
    get_json_object on hot paths. Oracle via DuckDB's JSON extraction
    on the same string column."""
    e = load_table(spark, "events", sf_dir)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        (F.variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_path"),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS all_and,
           CAST(bit_or(l_linenumber) AS BIGINT) AS any_or,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
           CAST(min(l_linenumber & 3) AS BIGINT) AS min_masked,
           CAST(max(l_linenumber << 2) AS BIGINT) AS max_shifted
    FROM lineitem GROUP BY 1
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate + scalar surface: bit_and/bit_or/bit_xor
    aggregates (xor-folds are how checksum-style integrity sweeps
    aggregate at scale — order-insensitive, mergeable) plus masked/
    shifted scalar forms. All integer-exact."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").cast("long").alias("all_and"),
        F.bit_or("l_linenumber").cast("long").alias("any_or"),
        F.bit_xor("l_orderkey").cast("long").alias("key_xor"),
        F.min(F.col("l_linenumber").bitwiseAND(F.lit(3))).cast("long").alias("min_masked"),
        F.max(F.shiftleft(F.col("l_linenumber"), 2)).cast("long").alias("max_shifted"),
    )


@register(
    "scalar_array_hof_funcs",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> length(w) > 7)) > 0 AS has_long,
           len(list_filter(string_split(text, ' '), w -> NOT (length(w) > 0))) = 0
             AS all_nonempty,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT)
             AS total_chars,
           CASE WHEN len(string_split(text, ' ')) >= 4
                THEN array_to_string([string_split(text, ' ')[i] || '-' ||
                                      string_split(text, ' ')[i+1] for i in range(1, 4)], '|')
                ELSE '' END AS bigram_head,
           CAST(len(flatten([string_split(text, ' '), string_split(text, ' ')])) AS BIGINT)
             AS doubled_len
    FROM documents
    """,
)
def scalar_array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function coverage beyond transform/filter:
    exists, forall, aggregate (left fold), zip_with (pairwise combine
    of shifted slices), flatten — all Catalyst lambda expressions,
    zero Python."""
    d = load_table(spark, "documents", sf_dir)
    ws = F.split(F.col("text"), " ")
    fold = F.aggregate(
        F.transform(ws, F.length), F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    zipped = F.when(
        F.size(ws) >= 4,
        F.array_join(
            F.zip_with(F.slice(ws, 1, 3), F.slice(ws, 2, 3), lambda a, b: F.concat_ws("-", a, b)),
            "|",
        ),
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id",
        F.exists(ws, lambda w: F.length(w) > 7).alias("has_long"),
        F.forall(ws, lambda w: F.length(w) > 0).alias("all_nonempty"),
        fold.alias("total_chars"),
        zipped.alias("bigram_head"),
        F.size(F.flatten(F.array(ws, ws))).cast("long").alias("doubled_len"),
    )


@register(
    "scalar_map_hof_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct(string_split(text, ' ')))[1:3] AS arr
      FROM documents
    )
    SELECT doc_id,
           array_to_string([w || ':' || CAST(length(w) * 2 AS VARCHAR) for w in arr], '|')
             AS doubled_entries,
           coalesce(array_to_string([w || ':' || CAST(length(w) * 2 AS VARCHAR)
                                     for w in arr if length(w) * 2 >= 8], '|'), '')
             AS filtered_entries,
           CAST(len([w for w in arr if length(w) * 2 >= 8]) AS BIGINT) AS n_kept
    FROM t
    """,
)
def scalar_map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map lambda surface: map_from_arrays to build, transform_values
    to rewrite, map_filter to prune — serialized as sorted 'k:v'
    entries so the oracle (list-based; DuckDB maps aren't
    Spark-identical) compares plain strings. The map lives only
    mid-plan, all Catalyst lambda expressions."""
    d = load_table(spark, "documents", sf_dir)
    arr = F.slice(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), 1, 3)
    m = F.map_from_arrays(arr, F.transform(arr, lambda w: F.length(w)))
    mv = F.transform_values(m, lambda k, v: v * 2)
    mf = F.map_filter(mv, lambda k, v: v >= 8)

    def ser(mp):
        ks = F.array_sort(F.map_keys(mp))
        return F.array_join(
            F.transform(ks, lambda k: F.concat_ws(":", k, F.element_at(mp, k))), "|"
        )

    return d.select(
        "doc_id",
        ser(mv).alias("doubled_entries"),
        ser(mf).alias("filtered_entries"),
        F.size(mf).cast("long").alias("n_kept"),
    )


@register(
    "scalar_explode_outer",
    oracle="""
    WITH w AS (
      SELECT doc_id, greatest(len(string_split(text, ' ')) - 59, 0) AS n60 FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN n60 = 0 THEN 1 ELSE n60 END AS BIGINT) AS n_rows,
           CAST(n60 AS BIGINT) AS n_grams
    FROM w
    """,
)
def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: expanding docs into 60-gram windows,
    documents too short for any window keep ONE row with a null
    element instead of vanishing — the null-preserving fan-out plain
    explode silently drops (the corpus straddles the 60-token line, so
    both branches are exercised). Verified by per-doc row vs non-null
    counts against the closed-form oracle."""
    d = load_table(spark, "documents", sf_dir)
    t = d.select(
        "doc_id", F.explode_outer(T.word_shingles(T.words(F.col("text")), 60)).alias("g")
    )
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("g").alias("n_grams")
    )


@register(
    "scalar_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             printf('https://api.example.com:8443/v1/%s/docs/%d?lang=%s&q=big%%20data',
                    source, doc_id, lang) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1)            AS proto,
           regexp_extract(url, '^https://([^:/]+)', 1)       AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1)  AS path,
           regexp_extract(url, 'lang=([^&]*)', 1)            AS lang_param,
           replace(regexp_extract(url, 'q=([^&]*)', 1), '%20', ' ') AS q_decoded
    FROM u
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function surface: `parse_url` component extraction
    (PROTOCOL/HOST/PATH, per-key QUERY param) and `url_decode` —
    the log/clickstream-parsing scalars. URLs are constructed from the
    documents table so the oracle (which has no parse_url) can verify
    the exact same components with anchored regexes. All JVM-side
    codegen scalars; zero shuffle."""
    d = load_table(spark, "documents", sf_dir)
    url = F.format_string(
        "https://api.example.com:8443/v1/%s/docs/%d?lang=%s&q=big%%20data",
        F.col("source"), F.col("doc_id"), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_decode(F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q"))).alias("q_decoded"),
    )


@register(
    "scalar_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)                                    AS text_md5,
           sha256(text)                                 AS text_sha256,
           CAST(length(md5(text)) AS BIGINT)            AS md5_len,
           substr(sha256(text), 1, 8)                   AS sha_head
    FROM documents
    """,
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash scalar surface: md5 and sha2-256 — the
    fingerprint primitives behind exact dedup, split assignment, and
    content-addressed storage keys. Standardized digests are
    bit-identical across engines by definition, so the oracle is
    direct. (xxhash64/crc32 exist too but are engine-seeded —
    internal-only, as in the SimHash/bucketing operators.)"""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length(F.md5("text")).cast("long").alias("md5_len"),
        F.substring(F.sha2(F.col("text"), 256), 1, 8).alias("sha_head"),
    )


@register(
    "scalar_xml_funcs",
    oracle="""
    WITH x AS (
      SELECT doc_id,
             printf('<doc id="%d"><lang>%s</lang><src>%s</src></doc>',
                    doc_id, lang, source) AS xml
      FROM documents
    )
    SELECT doc_id,
           CAST(regexp_extract(xml, 'id="(\\d+)"', 1) AS BIGINT) AS id_attr,
           regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang_el,
           regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src_el
    FROM x
    """,
)
def scalar_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar surface (native in Spark 4): XPath extraction of an
    attribute and child elements from an XML-typed string column — the
    feed/config-parsing path. XML is constructed from the documents
    table so the oracle (no XPath in DuckDB) verifies the identical
    components with regexes. All JVM-side scalars, zero shuffle."""
    d = load_table(spark, "documents", sf_dir)
    xml = F.format_string(
        '<doc id="%d"><lang>%s</lang><src>%s</src></doc>',
        F.col("doc_id"), F.col("lang"), F.col("source"),
    )
    x = d.select("doc_id", xml.alias("xml"))
    return x.select(
        "doc_id",
        F.expr("xpath_long(xml, '/doc/@id')").alias("id_attr"),
        F.expr("xpath_string(xml, '/doc/lang')").alias("lang_el"),
        F.expr("xpath_string(xml, '/doc/src')").alias("src_el"),
    )


@register(
    "scalar_collation_funcs",
    oracle="""
    SELECT doc_id,
           upper(source) AS shouty,
           (lower(upper(source)) = source) AS ci_equal,
           (lower(upper(lang)) = lower(lang)) AS lang_ci_equal,
           CAST(length(upper(source)) AS BIGINT) AS n
    FROM documents
    """,
)
def scalar_collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): equality under
    UTF8_LCASE matches case-insensitively at the COMPARISON level —
    the engine feature that replaces scattering lower() through every
    predicate. The oracle expresses the same truths with explicit
    lower() (DuckDB has no per-expression collation), which is exactly
    the rewrite collations obsolete."""
    d = load_table(spark, "documents", sf_dir)
    shouty = F.upper(F.col("source"))
    return d.select(
        "doc_id",
        shouty.alias("shouty"),
        (F.collate(shouty, "UTF8_LCASE") == F.collate(F.col("source"), "UTF8_LCASE")).alias(
            "ci_equal"
        ),
        (F.collate(F.upper(F.col("lang")), "UTF8_LCASE")
         == F.collate(F.col("lang"), "UTF8_LCASE")).alias("lang_ci_equal"),
        F.length(shouty).cast("long").alias("n"),
    )


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', '04107')              AS leeted,
           concat(substr(p_name, 1, 2), 'XX', substr(p_name, 5)) AS overlaid,
           concat(upper(substr(p_name, 1, 1)), substr(p_name, 2)) AS cap_first,
           repeat(p_brand, 2)                               AS doubled,
           reverse(p_type)                                  AS reversed,
           CAST(len(regexp_extract_all(p_name, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(strpos(p_name, ' ') AS BIGINT)              AS first_space,
           ltrim(rtrim(concat('  ', p_type, '  ')))          AS trimmed_both
    FROM part
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche: translate (char map), overlay
    (in-place splice), first-char capitalization, repeat, reverse,
    regexp_count, locate,
    ltrim/rtrim — the remainder of the everyday string surface beyond
    `scalar_string_funcs`. All codegen scalars, zero shuffle."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "04107").alias("leeted"),
        F.overlay("p_name", F.lit("XX"), F.lit(3), F.lit(2)).alias("overlaid"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)")
        ).alias("cap_first"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.reverse("p_type").alias("reversed"),
        F.regexp_count("p_name", F.lit("[0-9]")).alias("n_digits"),
        F.locate(" ", F.col("p_name")).cast("long").alias("first_space"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  ")))).alias(
            "trimmed_both"
        ),
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(dayofyear(o_orderdate) AS BIGINT)      AS doy,
           CAST(weekofyear(o_orderdate) AS BIGINT)     AS iso_week,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')      AS plus_3mo,
           floor(CAST(date_diff('day', o_orderdate,
                                TIMESTAMP '1998-01-01 00:00:00') AS DOUBLE) / 30.0
                 * 1e2 + 0.5) / 1e2 AS months_to_98_approx,
           CAST(epoch_us(date_trunc('week', o_orderdate)) AS BIGINT) AS week_start_us
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date tranche: day-of-year, ISO week, last_day, add_months,
    interval-scaled difference, week truncation (as epoch micros —
    both engines start ISO weeks on Monday). Calendar arithmetic is
    where dialects diverge quietly; each output is pinned to a form
    both engines define identically."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 500)
    from bigdata06_spark.queries.qutil import epoch_us, rnd

    return o.select(
        "o_orderkey",
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3mo"),
        rnd(
            F.date_diff(F.lit("1998-01-01").cast("timestamp"), F.col("o_orderdate")).cast(
                "double"
            )
            / 30.0,
            2,
        ).alias("months_to_98_approx"),
        epoch_us(F.date_trunc("week", F.col("o_orderdate"))).alias("week_start_us"),
    )


@register(
    "scalar_math_funcs2",
    oracle="""
    SELECT p_partkey,
           sqrt(CAST(p_size AS DOUBLE))                    AS root,
           floor(cbrt(CAST(p_size AS DOUBLE)) * 1e6 + 0.5) / 1e6     AS cuberoot,
           CAST(factorial(p_size % 10) AS BIGINT)          AS fact,
           pow(CAST(2 AS DOUBLE), CAST(p_size % 16 AS DOUBLE)) AS pow2,
           floor(exp(CAST(p_size % 5 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS exp_small,
           floor(log10(CAST(p_size + 1 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS log_ten,
           CAST(sign(CAST(p_size - 25 AS DOUBLE)) AS BIGINT) AS sgn,
           CAST(p_size % 7 AS BIGINT)                      AS modulo,
           greatest(p_size, 10, 25)                        AS hi,
           least(p_size, 10, 25)                           AS lo
    FROM part
    """,
)
def scalar_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second math tranche: sqrt (IEEE correctly-rounded, exact), cbrt
    (NOT required correctly-rounded — measured last-ulp JVM/libm
    divergence, hence 6dp-rounded),
    integer factorial, exact powers of two, exp/log10 (transcendental
    — 6dp-rounded, the last-ulp libm divergence guard), sign, modulo,
    greatest/least. Pure codegen scalars."""
    p = load_table(spark, "part", sf_dir)
    sz = F.col("p_size")
    from bigdata06_spark.queries.qutil import rnd

    return p.select(
        "p_partkey",
        F.sqrt(sz.cast("double")).alias("root"),
        rnd(F.cbrt(sz.cast("double")), 6).alias("cuberoot"),
        F.factorial(sz % 10).cast("long").alias("fact"),
        F.pow(F.lit(2.0), (sz % 16).cast("double")).alias("pow2"),
        rnd(F.exp((sz % 5).cast("double")), 6).alias("exp_small"),
        rnd(F.log10((sz + 1).cast("double")), 6).alias("log_ten"),
        F.signum((sz - 25).cast("double")).cast("long").alias("sgn"),
        (sz % 7).cast("long").alias("modulo"),
        F.greatest(sz, F.lit(10), F.lit(25)).alias("hi"),
        F.least(sz, F.lit(10), F.lit(25)).alias("lo"),
    )


@register(
    "scalar_array_funcs2",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' ')))[1:6] AS a
      FROM documents
    ),
    b AS (SELECT doc_id, a, ['scan', 'merge', 'zzz'] AS q FROM w)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(a, q)), '|'), '') AS inter,
           CAST(len(list_distinct(a || q)) AS BIGINT)                      AS union_n,
           coalesce(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(q, x))),
                                    '|'), '')                              AS a_minus_q,
           len(list_intersect(a, q)) > 0                                   AS overlaps,
           CAST(list_position(a, 'scan') AS BIGINT)                        AS scan_pos,
           array_to_string(list_prepend('HEAD', a[1:2]), '|')              AS prepended,
           array_to_string(a[2:4], '|')                                    AS sliced
    FROM b
    """,
)
def scalar_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array tranche — the SET-ALGEBRA surface: array_intersect /
    array_union / array_except / arrays_overlap / array_position plus
    insert-at-head and slicing. Set-producing results are sorted
    before serialization and the input basis is itself sorted-distinct
    (DuckDB's list_distinct does not preserve first-occurrence order,
    Spark's array_distinct does — sorting removes the divergence), and
    empty-array serializations coalesce to '' (DuckDB's
    array_to_string returns NULL on [])."""
    d = load_table(spark, "documents", sf_dir)
    a = F.slice(F.array_sort(F.array_distinct(T.words(F.col("text")))), 1, 6)
    q = F.array(F.lit("scan"), F.lit("merge"), F.lit("zzz"))
    b = d.select("doc_id", a.alias("a"), q.alias("q"))
    return b.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect("a", "q")), "|").alias("inter"),
        F.size(F.array_distinct(F.array_union("a", "q"))).cast("long").alias("union_n"),
        F.array_join(F.array_sort(F.array_except("a", "q")), "|").alias("a_minus_q"),
        F.arrays_overlap("a", "q").alias("overlaps"),
        F.array_position("a", "scan").cast("long").alias("scan_pos"),
        F.array_join(F.array_insert(F.slice("a", 1, 2), 1, F.lit("HEAD")), "|").alias(
            "prepended"
        ),
        F.array_join(F.slice("a", 2, 3), "|").alias("sliced"),
    )
