"""Scalar function queries (SURVEY.md §2.7, C5-C21) with DuckDB oracles.

Each query exercises the Spark built-in that carries the corresponding
kernel computation (regexp_count, ordered CASE chains, higher-order
array functions, coalesce-of-extracts, format_string, date_format,
to/from JSON) — all JVM-side, whole-stage-codegen friendly: the kernel
uses Python only where byte-parity demands it (KERNEL_SPEC.md), the
relational surface stays in Catalyst.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.relational import T


def c5_pattern_count(spark, sf):
    """C5 pattern scoring: 2 × regexp match count."""
    return T(spark, sf, "documents").select(
        "doc_id",
        (F.regexp_count(F.col("text"), F.lit(r"table")) * 2).alias(
            "pattern_score"),
    )


C5_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, 'table')) * 2 AS pattern_score
FROM documents
"""


def c6_currency_case(spark, sf):
    """C6 currency detection: first-match-wins ordered CASE chain."""
    d = T(spark, sf, "documents")
    txt = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" price $12,000"))
        .when(F.col("doc_id") % 7 == 1, F.lit(" price CHF 500"))
        .when(F.col("doc_id") % 7 == 2, F.lit(" price Rs 99"))
        .when(F.col("doc_id") % 7 == 3, F.lit(" price HK$5"))
        .otherwise(F.lit("")),
    )
    cur = (
        F.when(txt.contains("$"), "USD")
        .when(txt.contains("CHF"), "CHF")
        .when(txt.contains("Rs"), "INR")
        .when(txt.contains("HK$"), "HKD")
        .otherwise(F.lit(None).cast("string"))
    )
    return d.select("doc_id", cur.alias("currency"))


C6_SQL = """
SELECT doc_id,
  CASE
    WHEN contains(t2, '$') THEN 'USD'
    WHEN contains(t2, 'CHF') THEN 'CHF'
    WHEN contains(t2, 'Rs') THEN 'INR'
    WHEN contains(t2, 'HK$') THEN 'HKD'
  END AS currency
FROM (
  SELECT doc_id, text ||
    CASE doc_id % 7 WHEN 0 THEN ' price $12,000'
                    WHEN 1 THEN ' price CHF 500'
                    WHEN 2 THEN ' price Rs 99'
                    WHEN 3 THEN ' price HK$5'
                    ELSE '' END AS t2
  FROM documents)
"""


def c7_units_filter(spark, sf):
    """C7 units detection: HOF filter of a pattern list by \\b-anchored
    regex hits, list order preserved."""
    pats = F.array(*[F.lit(p) for p in ("key", "agg", "row", "scan",
                                        "merge")])
    d = T(spark, sf, "documents")
    units = F.filter(
        pats,
        lambda p: F.regexp_like(
            F.col("text"), F.concat(F.lit(r"\b"), p, F.lit(r"\b"))),
    )
    # joined to a plain string: the driver's hash harness cannot
    # canonicalize ARRAY columns (round-1 CORRECTNESS failure)
    return d.select("doc_id", F.array_join(units, ",").alias("units"))


C7_SQL = r"""
SELECT doc_id,
       coalesce(array_to_string(
         list_filter(['key', 'agg', 'row', 'scan', 'merge'],
                     p -> regexp_matches(text, '\b' || p || '\b')),
         ','), '') AS units
FROM documents
"""


def c8_fiscal_coalesce(spark, sf):
    """C8 fiscal-period: quarter → FY → range, first hit via coalesce
    of regexp extracts (empty → NULL)."""
    o = T(spark, sf, "orders")
    txt = F.concat(
        F.lit("report "),
        F.when(F.col("o_orderkey") % 3 == 0,
               F.concat(F.lit("Q"),
                        F.quarter("o_orderdate").cast("string"),
                        F.lit(" "),
                        F.year("o_orderdate").cast("string")))
        .when(F.col("o_orderkey") % 3 == 1,
              F.concat(F.lit("FY "),
                       F.year("o_orderdate").cast("string")))
        .otherwise(F.lit("undated")),
    )
    period = F.coalesce(
        F.nullif(F.regexp_extract(txt, r"(Q[1-4])\s*(\d{4}|\d{2})", 0),
                 F.lit("")),
        F.nullif(F.regexp_extract(txt, r"(FY)\s*(\d{4}|\d{2})", 0),
                 F.lit("")),
    )
    return o.select("o_orderkey", period.alias("fiscal_period"))


C8_SQL = r"""
SELECT o_orderkey,
       coalesce(
         nullif(regexp_extract(t2, '(Q[1-4])\s*(\d{4}|\d{2})', 0), ''),
         nullif(regexp_extract(t2, '(FY)\s*(\d{4}|\d{2})', 0), '')
       ) AS fiscal_period
FROM (
  SELECT o_orderkey, 'report ' ||
    CASE o_orderkey % 3
      WHEN 0 THEN 'Q' || CAST(quarter(o_orderdate) AS VARCHAR) || ' '
                  || CAST(year(o_orderdate) AS VARCHAR)
      WHEN 1 THEN 'FY ' || CAST(year(o_orderdate) AS VARCHAR)
      ELSE 'undated' END AS t2
  FROM orders)
"""


def c9_tickers(spark, sf):
    """C9 ticker extraction: regexp_extract_all uppercase tokens, minus
    exclusion set, distinct, sorted, capped at 10."""
    p = T(spark, sf, "part")
    txt = F.concat(F.col("p_type"), F.lit(" "), F.upper("p_name"),
                   F.lit(" USD CEO"))
    arr = F.regexp_extract_all(txt, F.lit(r"\b[A-Z]{1,5}\b"), 0)
    cleaned = F.slice(
        F.array_sort(
            F.array_distinct(
                F.array_except(
                    arr,
                    F.array(F.lit("USD"), F.lit("EUR"), F.lit("CEO"),
                            F.lit("CFO")),
                )
            )
        ),
        1, 10,
    )
    # joined to a plain string: the driver's hash harness cannot
    # canonicalize ARRAY columns (round-1 CORRECTNESS failure)
    return p.select("p_partkey",
                    F.array_join(cleaned, ",").alias("tickers"))


C9_SQL = r"""
SELECT p_partkey,
       coalesce(array_to_string(
         list_sort(list_distinct(
           list_filter(
             regexp_extract_all(p_type || ' ' || upper(p_name) || ' USD CEO',
                                '\b[A-Z]{1,5}\b'),
             t -> t NOT IN ('USD', 'EUR', 'CEO', 'CFO'))))[1:10],
         ','), '') AS tickers
FROM part
"""


def c10_numeric_rlike(spark, sf):
    """C10 numeric-literal regex test."""
    e = T(spark, sf, "events")
    v = F.get_json_object("props", "$.k")
    return e.groupBy(
        v.rlike(r"^-?\d+\.?\d*$").alias("is_numeric")
    ).agg(F.count("*").alias("n"))


C10_SQL = r"""
SELECT regexp_matches(json_extract_string(props, '$.k'),
                      '^-?\d+\.?\d*$') AS is_numeric,
       count(*) AS n
FROM events GROUP BY 1
"""


def c11_md5(spark, sf):
    """C11 md5 content hashing (the D1 dedup key primitive)."""
    return T(spark, sf, "documents").select(
        "doc_id", F.md5(F.substring("text", 1, 16)).alias("h"))


C11_SQL = "SELECT doc_id, md5(substring(text, 1, 16)) AS h FROM documents"


def c12_base64(spark, sf):
    """C12 base64 encode fallback for payload transport
    (ref main.py:398-399)."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.base64(F.substring("text", 1, 48).cast("binary")).alias("b64"))


C12_SQL = """
SELECT doc_id, to_base64(encode(substring(text, 1, 48))) AS b64
FROM documents
"""


def c22_date_trunc(spark, sf):
    """Calendar bucketing: weekly rollup via date_trunc (both engines
    start ISO weeks on Monday; Spark returns TIMESTAMP → cast to DATE
    to match DuckDB)."""
    o = T(spark, sf, "orders")
    return (
        o.groupBy(
            F.to_date(F.date_trunc("week", "o_orderdate")).alias("wk"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("volume"))
    )


C22_SQL = """
SELECT date_trunc('week', o_orderdate) AS wk,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS volume
FROM orders GROUP BY 1
"""


def c23_levenshtein(spark, sf):
    """Edit distance (fuzzy near-dup primitive): distance between each
    part name and its type string, bucketed."""
    p = T(spark, sf, "part")
    d = F.levenshtein(F.lower("p_name"), F.lower("p_type"))
    return (
        p.groupBy((d - d % 10).alias("dist_bucket"))
        .agg(F.count("*").alias("n"))
    )


C23_SQL = """
SELECT d - d % 10 AS dist_bucket, count(*) AS n
FROM (SELECT levenshtein(lower(p_name), lower(p_type)) AS d FROM part)
GROUP BY 1
"""


def c24_map_ops(spark, sf):
    """MAP<STRING,STRING> round-trip (the reference's open-schema
    metadata dict, SURVEY.md §1.2): build per-row maps, extract by
    key, measure cardinality — output flattened to plain columns for
    the driver's hash harness."""
    d = T(spark, sf, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"),
        F.lit("src"), F.col("source"),
        F.lit("size"), F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        m["lang"].alias("meta_lang"),
        m["size"].alias("meta_size"),
        F.size(m).alias("n_keys"),
    )


C24_SQL = """
SELECT doc_id,
       map_extract(m, 'lang')[1] AS meta_lang,
       map_extract(m, 'size')[1] AS meta_size,
       CAST(cardinality(m) AS INT) AS n_keys
FROM (SELECT doc_id,
             map(['lang', 'src', 'size'],
                 [lang, source, CAST(n_chars AS VARCHAR)]) AS m
      FROM documents)
"""


def c13_format_string(spark, sf):
    """C13 filename generation format."""
    li = T(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.format_string("table_p%03d_t%03d_%s.csv",
                        F.col("l_linenumber"),
                        (F.col("l_orderkey") % 100).cast("int"),
                        F.col("l_returnflag")).alias("filename"),
    )


C13_SQL = """
SELECT l_orderkey, l_linenumber,
       printf('table_p%03d_t%03d_%s.csv', l_linenumber,
              CAST(l_orderkey % 100 AS INT), l_returnflag) AS filename
FROM lineitem WHERE l_orderkey <= 200
"""


def c14_date_format(spark, sf):
    """C14 timestamp stamp from DATA (never the clock — quirk #8)."""
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd_HHmmss").alias("stamp"),
    )


C14_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d_%H%M%S') AS stamp
FROM orders
"""


def c15_exhibit_regex(spark, sf):
    """C15 exhibit/figure reference extraction (case-insensitive)."""
    e = T(spark, sf, "events").filter(F.col("event_id") < 2000)
    txt = F.concat(
        F.lit("see "),
        F.when(F.col("event_id") % 2 == 0,
               F.concat(F.lit("Figure "),
                        (F.col("event_id") % 20).cast("string")))
        .otherwise(F.concat(F.lit("exhibit "),
                            (F.col("event_id") % 9).cast("string"))),
    )
    return e.select(
        "event_id",
        F.regexp_extract(txt, r"(?i)(Figure|Fig\.?|Exhibit)\s*(\d+)", 0)
        .alias("figref"),
    )


C15_SQL = r"""
SELECT event_id,
       regexp_extract('see ' ||
         CASE WHEN event_id % 2 = 0
              THEN 'Figure ' || CAST(event_id % 20 AS VARCHAR)
              ELSE 'exhibit ' || CAST(event_id % 9 AS VARCHAR) END,
         '(?i)(Figure|Fig\.?|Exhibit)\s*(\d+)', 0) AS figref
FROM events WHERE event_id < 2000
"""


def c16_subtype_case(spark, sf):
    """C16 subtype rules: ordered keyword CASE chain."""
    t = F.col("text")
    sub = (
        F.when(t.contains("merge"), "merge_doc")
        .when(t.contains("window"), "window_doc")
        .when(t.contains("shuffle"), "shuffle_doc")
        .when(t.contains("sort"), "sort_doc")
        .otherwise("general_doc")
    )
    return T(spark, sf, "documents").groupBy(sub.alias("subtype")).agg(
        F.count("*").alias("n"))


C16_SQL = """
SELECT CASE WHEN contains(text, 'merge') THEN 'merge_doc'
            WHEN contains(text, 'window') THEN 'window_doc'
            WHEN contains(text, 'shuffle') THEN 'shuffle_doc'
            WHEN contains(text, 'sort') THEN 'sort_doc'
            ELSE 'general_doc' END AS subtype,
       count(*) AS n
FROM documents GROUP BY 1
"""


def c17_preview(spark, sf):
    """C17 text preview truncation gated on length."""
    d = T(spark, sf, "documents")
    preview = F.when(
        F.length("text") > 200,
        F.concat(F.substring("text", 1, 200), F.lit("...")),
    ).otherwise(F.col("text"))
    return d.select("doc_id", preview.alias("preview"))


C17_SQL = """
SELECT doc_id,
       CASE WHEN length(text) > 200 THEN substring(text, 1, 200) || '...'
            ELSE text END AS preview
FROM documents
"""


def c18_from_json(spark, sf):
    """C18 JSON metadata (de)serialization."""
    e = T(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(k), 4).alias("avg_k"),
             F.sum(k).alias("sum_k"))
    )


C18_SQL = """
SELECT event_type,
       CAST(round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
            AS DOUBLE) AS avg_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


def c19_weighted_score(spark, sf):
    """C19 weighted quality score (.3/.2/.2/.2/.1 arithmetic expr)."""
    d = T(spark, sf, "documents")
    m1 = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    m2 = F.least(F.length("text") / 400.0, F.lit(1.0))
    m3 = F.when(F.col("text").contains("table"), 1.0).otherwise(0.5)
    m4 = F.when(F.col("lang") == "en", 1.0).otherwise(0.8)
    m5 = F.lit(1.0)
    score = 0.3 * m1 + 0.2 * m2 + 0.2 * m3 + 0.2 * m4 + 0.1 * m5
    return d.select("doc_id", F.round(score, 6).alias("quality_score"))


C19_SQL = """
SELECT doc_id,
       CAST(round(0.3 * least(n_chars / 500.0, 1.0)
                + 0.2 * least(length(text) / 400.0, 1.0)
                + 0.2 * (CASE WHEN contains(text, 'table') THEN 1.0
                              ELSE 0.5 END)
                + 0.2 * (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.8 END)
                + 0.1, 6) AS DOUBLE) AS quality_score
FROM documents
"""


def c21_size_buckets(spark, sf):
    """C21 size-appropriateness buckets."""
    b = (
        F.when((F.col("n_chars") >= 100) & (F.col("n_chars") <= 300), 1.0)
        .when(F.col("n_chars") < 100, 0.1)
        .when(F.col("n_chars") > 450, 0.6)
        .otherwise(0.8)
    )
    return T(spark, sf, "documents").groupBy(
        b.alias("size_score")).agg(F.count("*").alias("n"))


C21_SQL = """
SELECT CAST(CASE WHEN n_chars >= 100 AND n_chars <= 300 THEN 1.0
            WHEN n_chars < 100 THEN 0.1
            WHEN n_chars > 450 THEN 0.6
            ELSE 0.8 END AS DOUBLE) AS size_score,
       count(*) AS n
FROM documents GROUP BY 1
"""


QUERIES = {
    "c5_pattern_count": (c5_pattern_count, C5_SQL),
    "c6_currency_case": (c6_currency_case, C6_SQL),
    "c7_units_filter": (c7_units_filter, C7_SQL),
    "c8_fiscal_coalesce": (c8_fiscal_coalesce, C8_SQL),
    "c9_tickers": (c9_tickers, C9_SQL),
    "c10_numeric_rlike": (c10_numeric_rlike, C10_SQL),
    "c11_md5": (c11_md5, C11_SQL),
    "c12_base64": (c12_base64, C12_SQL),
    "c22_date_trunc": (c22_date_trunc, C22_SQL),
    "c23_levenshtein": (c23_levenshtein, C23_SQL),
    "c24_map_ops": (c24_map_ops, C24_SQL),
    "c13_format_string": (c13_format_string, C13_SQL),
    "c14_date_format": (c14_date_format, C14_SQL),
    "c15_exhibit_regex": (c15_exhibit_regex, C15_SQL),
    "c16_subtype_case": (c16_subtype_case, C16_SQL),
    "c17_preview": (c17_preview, C17_SQL),
    "c18_from_json": (c18_from_json, C18_SQL),
    "c19_weighted_score": (c19_weighted_score, C19_SQL),
    "c21_size_buckets": (c21_size_buckets, C21_SQL),
}
