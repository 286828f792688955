"""Scalar function surface: string, date, math, conditional, JSON, array.
Goal-derived (the reference's only scalar computation is CRC32,
/root/reference/src/common/crc32.rs). All JVM-side built-ins — these stay
inside whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           CONCAT(c_mktsegment, '#', c_name) AS seg_name,
           TRIM(c_name) AS name_trim,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer WHERE c_custkey <= 200
    """,
    category="scalar",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat("c_mktsegment", F.lit("#"), "c_name").alias("seg_name"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_replaced"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k
    FROM orders WHERE o_custkey <= 100
    """,
    category="scalar",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 0) AS price_round,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
           CAST(l_orderkey % 10 AS BIGINT) AS key_mod
    FROM lineitem WHERE l_orderkey <= 500
    """,
    category="scalar",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 10).cast("long").alias("key_mod"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'not-pending') AS status_or_default,
           GREATEST(o_totalprice, 150000.0) AS price_floor150k,
           LEAST(CAST(o_custkey AS BIGINT), CAST(o_orderkey AS BIGINT)) AS min_key,
           CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                THEN TRUE ELSE FALSE END AS is_urgent
    FROM orders WHERE o_custkey <= 100
    """,
    category="scalar",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("not-pending")).alias(
            "status_or_default"
        ),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("price_floor150k"),
        F.least(F.col("o_custkey").cast("long"), F.col("o_orderkey").cast("long")).alias("min_key"),
        (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")).alias(
            "is_urgent"
        ),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(e.props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(e.props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events e
    GROUP BY e.event_type
    """,
    category="scalar",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload + aggregate. Uses
    get_json_object (JVM-side JSON path) — at scale prefer from_json with an
    explicit schema once the payload shape is known."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS vec_sum,
           ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vec_max
    FROM embeddings WHERE vec_id <= 100
    """,
    category="scalar",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on the embedding column — size, indexing, fold-style
    aggregation — all JVM higher-order functions, no UDF."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_elem"),
        F.round(F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x), 6).alias("vec_sum"),
        F.round(F.array_max(vec_d), 6).alias("vec_max"),
    )


@query(
    "scalar_url_parse",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?ref=r' || CAST(doc_id % 7 AS VARCHAR) || '#frag' AS url
      FROM documents WHERE doc_id <= 300)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS qs,
           string_split(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.')[1] AS site
    FROM seeded
    """,
    category="scalar",
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — host / path / query-string / first host label — via the
    JVM-side `parse_url` expression (the oracle re-derives the same parts
    with regexes). Domain extraction is the workhorse of crawl-corpus
    curation (per-domain quality priors, domain-level dedup and rate caps);
    fixture docs carry no URLs, so deterministic URLs are seeded from
    (source, doc_id) exactly like the PII-redaction twin seeds emails."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#frag"),
    )
    seeded = d.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return seeded.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("qs"),
        F.split(host, r"\.").getItem(0).alias("site"),
    )


@query(
    "scalar_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(y := CAST(year(o_orderdate) AS INT),
                               m := CAST(month(o_orderdate) AS INT))) AS ym_json,
           struct_pack(y := CAST(year(o_orderdate) AS INT),
                       m := CAST(month(o_orderdate) AS INT))
             < struct_pack(y := 2024, m := 6) AS before_jun24,
           CAST(year(o_orderdate) AS INT) AS y_field
    FROM orders WHERE o_orderkey <= 2000
    """,
    category="scalar",
)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) scalar surface: construction (named_struct),
    field extraction, JSON serialization, and LEXICOGRAPHIC struct
    comparison (the composite-key ordering trick used all over the engine,
    e.g. the as-of tie-breaks). Top-level output stays scalar/JSON so the
    driver's hash canonicalizer never sees a raw struct column."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    s = F.struct(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    )
    bound = F.struct(F.lit(2024).alias("y"), F.lit(6).alias("m"))
    return o.select(
        "o_orderkey",
        F.to_json(s).alias("ym_json"),
        (s < bound).alias("before_jun24"),
        s.getField("y").alias("y_field"),
    )


@query(
    "scalar_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           substr(md5(text), 1, 8) AS shard_key
    FROM documents WHERE doc_id <= 300
    """,
    category="scalar",
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic/content hashing surface: md5 + sha256 digests and the
    hex-prefix shard key derivation — the primitives under exact dedup,
    deterministic sampling, and content-addressed storage. Direct kin of
    the reference's ONLY scalar function, CRC32 over byte slices
    (/root/reference/src/common/crc32.rs:1-123; the engine's crc32 parity
    with zlib is property-tested separately in the bucket-hash suite).
    Pure codegen'd JVM expressions, zero shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 300)
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.md5("text"), 1, 8).alias("shard_key"),
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN props ->> '$.missing' IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_path
    FROM events GROUP BY event_type
    """,
    category="scalar",
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): props
    parses ONCE into the binary variant encoding, then typed path access
    (variant_get) replaces repeated JSON string re-parsing — the
    open-schema column pattern for event properties at scale, where
    parse-per-access is the classic CPU sink. try_variant_get on a missing
    path yields NULL, not an error. The whole pipeline is codegen'd
    expressions over one hash aggregate."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        e.select(
            "event_type",
            F.variant_get(v, "$.k", "bigint").alias("k"),
            F.try_variant_get(v, "$.missing", "bigint").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_path"),
        )
    )


@query(
    "scalar_format_funcs",
    oracle="""
    SELECT o_orderkey,
           printf('%09d', o_orderkey) AS padded_key,
           printf('order %d totals %.2f', o_orderkey, o_totalprice)
             AS summary_line,
           lpad(o_orderstatus, 4, '.') AS status_padded,
           printf('%,d', CAST(floor(o_totalprice) AS BIGINT)) AS grouped_price
    FROM orders WHERE o_orderkey < 200
    """,
    category="scalar",
)
def scalar_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting surface — zero-padded ids, printf-style
    templating, pad alignment, and thousands-grouped money — the
    report/export rendering layer (Spark format_string == C printf ==
    DuckDB printf, including the %,d grouping flag; format_number's
    locale-dependence is avoided on purpose). Pure row-local codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.format_string("%09d", "o_orderkey").alias("padded_key"),
        F.format_string(
            "order %d totals %.2f", "o_orderkey", "o_totalprice"
        ).alias("summary_line"),
        F.lpad("o_orderstatus", 4, ".").alias("status_padded"),
        F.format_string(
            "%,d", F.floor("o_totalprice").cast("long")
        ).alias("grouped_price"),
    )


@query(
    "scalar_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT o_orderkey, md5('order:' || CAST(o_orderkey AS VARCHAR)) AS hx
      FROM orders WHERE o_orderkey < 200)
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5'
             || substr(hx, 14, 3) || '-' || substr(hx, 17, 4) || '-'
             || substr(hx, 21, 12) AS stable_uuid
    FROM h
    """,
    category="scalar",
)
def scalar_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-derived stable UUIDs (the UUIDv5 idea rendered portably:
    md5 of a namespaced key formatted as 8-4-4-4-12 with the version
    nibble pinned) — the surrogate-key generator that stays IDENTICAL
    across engines, re-runs, and partitionings, unlike uuid()/rand()
    which poison reproducible pipelines. Pure row-local codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    hx = F.md5(F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")))
    return o.select(
        "o_orderkey",
        F.concat(
            F.substring(hx, 1, 8), F.lit("-"),
            F.substring(hx, 9, 4), F.lit("-5"),
            F.substring(hx, 14, 3), F.lit("-"),
            F.substring(hx, 17, 4), F.lit("-"),
            F.substring(hx, 21, 12),
        ).alias("stable_uuid"),
    )


@query(
    "scalar_trig_funcs",
    oracle="""
    SELECT o_orderkey,
           ROUND(sin(radians(o_orderkey % 360)), 6) AS sin_deg,
           ROUND(cos(radians(o_orderkey % 360)), 6) AS cos_deg,
           ROUND(degrees(atan2(CAST(o_orderkey % 7 AS DOUBLE),
                               CAST(1 + o_orderkey % 5 AS DOUBLE))), 6)
             AS bearing_deg,
           ROUND(cbrt(o_totalprice), 6) AS cbrt_price,
           ROUND((EXP(CAST(o_orderkey % 3 AS DOUBLE))
                  - EXP(-CAST(o_orderkey % 3 AS DOUBLE))) / 2, 6) AS sinh_k
    FROM orders WHERE o_orderkey < 200
    """,
    category="scalar",
)
def scalar_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/hyperbolic scalar surface — sin/cos over radians
    conversion, atan2 bearings back to degrees, cube root, sinh — the
    numeric kernel pieces geo math and signal features are built from
    (geo.py composes the same primitives into haversine). Pure row-local
    codegen; both engines agree to the shown rounding."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.round(F.sin(F.radians(F.col("o_orderkey") % 360)), 6).alias("sin_deg"),
        F.round(F.cos(F.radians(F.col("o_orderkey") % 360)), 6).alias("cos_deg"),
        F.round(
            F.degrees(
                F.atan2(
                    (F.col("o_orderkey") % 7).cast("double"),
                    (1 + F.col("o_orderkey") % 5).cast("double"),
                )
            ),
            6,
        ).alias("bearing_deg"),
        F.round(F.cbrt("o_totalprice"), 6).alias("cbrt_price"),
        F.round(F.sinh((F.col("o_orderkey") % 3).cast("double")), 6).alias("sinh_k"),
    )


@query(
    "scalar_slugify",
    oracle="""
    SELECT doc_id,
           trim(BOTH '-' FROM regexp_replace(
               lower(substr(text, 1, 40)), '[^a-z0-9]+', '-', 'g'))
             AS slug
    FROM documents WHERE doc_id < 300
    """,
    category="scalar",
)
def scalar_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-slug generation from document text (first 40 chars: lowercase,
    non-alphanumeric runs collapse to single hyphens, edges trimmed) —
    the id-from-title utility of every CMS/catalog exporter. One regexp
    pass, row-local."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    slug = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.substring("text", 1, 40)), "[^a-z0-9]+", "-"
        ),
        "^-+|-+$",
        "",
    )
    return d.select("doc_id", slug.alias("slug"))


@query(
    "scalar_base64_hex_funcs",
    oracle="""
    SELECT doc_id,
           to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS b64,
           hex(CAST(substr(text, 1, 6) AS BLOB)) AS hex6,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 200
    """,
    category="scalar",
)
def scalar_base64_hex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary text encodings — base64, hex, byte length — the
    serialization surface for payload columns (API exports, digests,
    debugging binary cells). ASCII fixture text makes the varchar->blob
    casts byte-exact across engines. Pure row-local codegen."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("b64"),
        F.hex(F.encode(F.substring("text", 1, 6), "UTF-8")).alias("hex6"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@query(
    "scalar_mask_pii",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_name,
           CAST(length(c_name) AS BIGINT) AS orig_len
    FROM customer WHERE c_custkey < 300
    """,
    category="scalar",
)
def scalar_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving data masking via the built-in mask() (Spark 3.4+):
    uppercase -> X, lowercase -> x, digits -> n, punctuation kept —
    redaction that preserves format validators and lengths (the display
    rule for PII columns in lower environments). The oracle re-derives
    the same mapping with regexp chains, proving the builtin's contract;
    text_redact_pii is the pattern-targeted sibling."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.length("c_name").cast("long").alias("orig_len"),
    )


@query(
    "scalar_translate_char_funcs",
    oracle="""
    SELECT doc_id,
           translate(substr(text, 1, 30), 'aeiou', '#####') AS vowels_masked,
           ascii(substr(text, 1, 1)) AS first_code,
           chr(65 + CAST(doc_id % 26 AS INT)) AS rotor_letter,
           repeat('*', CAST(1 + doc_id % 5 AS INT)) AS stars
    FROM documents WHERE doc_id < 200
    """,
    category="scalar",
)
def scalar_translate_char_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level scalar surface — translate (per-char substitution,
    the one-pass masking/transliteration primitive), ascii/chr codepoint
    round-trip, repeat — the low-level string kernel fancier masking and
    encoding ops compose from. Pure row-local codegen."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.translate(F.substring("text", 1, 30), "aeiou", "#####").alias(
            "vowels_masked"
        ),
        F.ascii(F.substring("text", 1, 1)).alias("first_code"),
        F.chr(65 + F.col("doc_id") % 26).alias("rotor_letter"),
        F.repeat(F.lit("*"), (1 + F.col("doc_id") % 5).cast("int")).alias("stars"),
    )
