"""Scalar function surface (SURVEY.md §2.8) + production-rule analogs
(§2.2 P7–P10): substring/cast/conditional-year (the reference's TaxYear
derivation), regex, concat, case-recodes, null defaults, JSON access.

All are native Column expressions — whole-stage-codegen'd, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "scalar_tax_year_derivation",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m') AS tax_period,
           CASE WHEN substr(strftime(o_orderdate, '%Y%m'), 5, 2) = '12'
                THEN CAST(substr(strftime(o_orderdate, '%Y%m'), 1, 4) AS BIGINT)
                ELSE CAST(substr(strftime(o_orderdate, '%Y%m'), 1, 4) AS BIGINT) - 1
           END AS tax_year
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def scalar_tax_year_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TaxYear rule (build_efile_database_functions.R:81-84):
    year − 1 unless the period ends in December. Exercised over
    o_orderdate re-encoded as a YYYYMM TaxPeriod string."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    period = F.date_format("o_orderdate", "yyyyMM")
    yr = F.substring(period, 1, 4).cast("long")
    return o.select(
        "o_orderkey",
        period.alias("tax_period"),
        F.when(F.substring(period, 5, 2) == "12", yr).otherwise(yr - 1).alias("tax_year"),
    )


@register(
    "scalar_string_ops",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_num,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_type, 'PROMO', 'PROMOTIONAL') AS type_full
    FROM part
    """,
)
def scalar_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4/F5/F6/F7 equivalents: substring, regex scrub (the
    reference's URL→ObjectId at get_object_id :39-44), concat, case
    conversion, token replace (gsub :620)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_num"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_type", "PROMO", "PROMOTIONAL").alias("type_full"),
    )


@register(
    "scalar_regexp_extract_key",
    oracle="""
    SELECT o_orderkey,
           regexp_extract('https://s3.amazonaws.com/irs-form-990/' || CAST(o_orderkey AS VARCHAR) || '_public.xml',
                          '990/([0-9]+)_public', 1) AS object_id
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def scalar_regexp_extract_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: strip URL prefix/suffix → ObjectId (get_object_id :39-44),
    exercised on synthesized reference-shaped URLs."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    url = F.concat(
        F.lit("https://s3.amazonaws.com/irs-form-990/"),
        F.col("o_orderkey").cast("string"),
        F.lit("_public.xml"),
    )
    return o.select(
        "o_orderkey",
        F.regexp_extract(url, r"990/([0-9]+)_public", 1).alias("object_id"),
    )


@register(
    "scalar_case_recode_collapse",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                              WHEN 'P' THEN 'Pending' END AS status_label,
           COALESCE(NULLIF(CASE WHEN o_totalprice > 300000 THEN 'big' ELSE '' END, ''),
                    NULLIF(CASE WHEN o_totalprice > 100000 THEN 'mid' ELSE '' END, ''),
                    'small') AS size_class
    FROM orders
    """,
)
def scalar_case_recode_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 checkbox→label recode + P9 categorical collapse
    (FORMORG :620-621, ACCTMETHOD :670-671 pattern: mutually-exclusive
    indicators coalesced into one category, '' → next candidate)."""
    o = load_table(spark, sf_dir, "orders")
    status_label = (
        F.when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "F", "Finished")
        .when(F.col("o_orderstatus") == "P", "Pending")
    )
    big = F.nullif(F.when(F.col("o_totalprice") > 300000, "big").otherwise(""), F.lit(""))
    mid = F.nullif(F.when(F.col("o_totalprice") > 100000, "mid").otherwise(""), F.lit(""))
    return o.select(
        "o_orderkey",
        status_label.alias("status_label"),
        F.coalesce(big, mid, F.lit("small")).alias("size_class"),
    )


@register(
    "scalar_null_default_rule",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(CASE WHEN l_quantity > 25 THEN CAST(l_quantity AS VARCHAR) END, '0') AS qty_rule,
           CASE WHEN l_returnflag = 'R'
                THEN COALESCE(CASE WHEN l_tax > 0.05 THEN CAST(l_tax AS VARCHAR) END, '0')
                ELSE CASE WHEN l_tax > 0.05 THEN CAST(l_tax AS VARCHAR) END
           END AS tax_rule
    FROM lineitem WHERE l_orderkey <= 2000
    """,
)
def scalar_null_default_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: the zeroALL / form-gated zeroPC production rules
    (build_efile_database_functions.R:6-35): null → '0', optionally
    conditional on a discriminator column."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    qty_str = F.when(F.col("l_quantity") > 25, F.col("l_quantity").cast("string"))
    tax_str = F.when(F.col("l_tax") > 0.05, F.col("l_tax").cast("string"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(qty_str, F.lit("0")).alias("qty_rule"),
        F.when(F.col("l_returnflag") == "R", F.coalesce(tax_str, F.lit("0")))
        .otherwise(tax_str)
        .alias("tax_rule"),
    )


@register(
    "scalar_conditional_horizontal_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R'
                THEN CAST(COALESCE(CAST(l_discount AS DECIMAL(18,2)), 0)
                        + COALESCE(CAST(l_tax AS DECIMAL(18,2)), 0) AS DOUBLE)
                ELSE CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE)
           END AS fee_components
    FROM lineitem WHERE l_orderkey <= 2000
    """,
)
def scalar_conditional_horizontal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's form-dependent horizontal sum
    (EXPGAMINGFNDEVENTS :1034-1043 — PC forms sum components NA-ignoring,
    EZ forms take a single field)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    pc_sum = F.coalesce(dec("l_discount"), F.lit(0)) + F.coalesce(dec("l_tax"), F.lit(0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", pc_sum.cast("double"))
        .otherwise(dec("l_tax").cast("double"))
        .alias("fee_components"),
    )


@register(
    "scalar_math_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile,
           l_orderkey % 7 AS key_mod
    FROM lineitem WHERE l_orderkey <= 2000
    """,
)
def scalar_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic is deterministic in IEEE doubles (same inputs,
    same ops) — only aggregation order is not; safe to compare raw."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 10.0).cast("long").alias("qty_decile"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "scalar_date_parts",
    oracle="""
    SELECT event_id,
           CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
           CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS m,
           CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day_str
    FROM events WHERE event_id <= 2000
    """,
)
def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_str"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_id <= 2000
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: JSON field access (the reference parses the S3 index JSON,
    :68) — native get_json_object, no UDF."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "scalar_to_json_struct",
    oracle="""
    SELECT o_orderkey,
           '{"status":"' || o_orderstatus || '","priority":"' || o_orderpriority || '"}'
             AS order_json
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def scalar_to_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: struct → JSON serialization (reference demo toJSON,
    BUILD_SCRIPTS/README.md:237-247)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("order_json"),
    )


@register(
    "scalar_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           ROUND(CAST(list_sum(list_transform(embedding,
                 x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                      AS DECIMAL(30,15)))) AS DOUBLE), 6) AS sum_sq,
           CASE WHEN len(list_filter(embedding, x -> x > 0.9)) > 0
                THEN 1 ELSE 0 END AS has_gt09
    FROM embeddings
    WHERE vec_id < 300
    """,
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter / transform / exists) over
    the embedding column — all evaluated inside the scan projection,
    no explode (the explode+groupBy formulation shuffles dim× the
    rows for the same numbers). Sum-of-squares accumulates in decimal
    so the value is fold-order-free on both engines."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    sq = F.aggregate(
        F.transform(
            "embedding",
            lambda x: (x.cast("double") * x.cast("double")).cast("decimal(30,15)"),
        ),
        F.lit(0).cast("decimal(30,15)"),
        lambda acc, p: (acc + p).cast("decimal(30,15)"),
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(sq.cast("double"), 6).alias("sum_sq"),
        F.when(
            F.exists("embedding", lambda x: x > 0.9), F.lit(1)
        ).otherwise(F.lit(0)).alias("has_gt09"),
    )


@register(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             concat('https://efile.example.org/', replace(o_orderpriority, ' ', '-'), '/doc',
                    CAST(o_orderkey AS VARCHAR), '.xml?yr=',
                    CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)) AS url
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'yr=([0-9]+)', 1) AS yr_param
    FROM u
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the built-in parse_url (host, path, and
    a named query parameter) — the provenance-extraction scalar a
    crawl pipeline runs per document; the oracle derives the same
    pieces with regexes, so Spark's parse_url semantics are what's
    actually under test."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    url = F.concat(
        F.lit("https://efile.example.org/"),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("-")),
        F.lit("/doc"),
        F.col("o_orderkey").cast("string"),
        F.lit(".xml?yr="),
        F.year("o_orderdate").cast("string"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("yr")).alias("yr_param"),
    )


@register(
    "scalar_pseudonymize_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             sha256(concat('pepper-2024:', CAST(c_custkey AS VARCHAR)))
               AS token
      FROM customer
    ),
    o AS (
      SELECT sha256(concat('pepper-2024:', CAST(o_custkey AS VARCHAR)))
               AS token
      FROM orders
    )
    SELECT c.token, CAST(COUNT(o.token) AS BIGINT) AS n_orders
    FROM c LEFT JOIN o USING (token)
    WHERE c.c_custkey <= 200
    GROUP BY c.token
    """,
)
def scalar_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization (keyed tokenization): natural
    keys are replaced by salted SHA-256 surrogates BEFORE data leaves
    the trust boundary, and — the property that makes the technique
    usable — tokenized tables still JOIN on the token exactly as the
    originals joined on the key. Pure projection (JVM-side sha2) plus
    one token-keyed join; the released output carries no reversible
    key. The raw custkey appears only inside the WHERE that bounds the
    gated output, not in the result."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    tok = lambda col: F.sha2(  # noqa: E731
        F.concat(F.lit("pepper-2024:"), F.col(col).cast("string")), 256
    )
    ct = c.filter(F.col("c_custkey") <= 200).select(tok("c_custkey").alias("token"))
    ot = o.select(tok("o_custkey").alias("token").alias("token"))
    return (
        ct.join(ot.withColumnRenamed("token", "otoken"),
                F.col("token") == F.col("otoken"), "left")
        .groupBy("token")
        .agg(F.count("otoken").cast("long").alias("n_orders"))
    )


@register(
    "scalar_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
           CAST(EXTRACT(dow FROM o_orderdate) + 1 AS BIGINT) AS dow_sun1,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')
             AS plus_3_months,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_95
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function suite (the §2.8 calendar surface in one
    gated row set): extract family, Sunday-1 day-of-week, month end,
    calendar-aware month addition, ISO week truncation, day diffs —
    each pinned against the other engine's independent calendar
    implementation, which is exactly where engines silently disagree
    (week start conventions, month-end clamping, DOW origin)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.quarter(d).cast("long").alias("qtr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.datediff(d, F.lit("1995-01-01")).cast("long").alias("days_since_95"),
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 5) = 0 THEN NULL
                ELSE round(o_totalprice / (o_orderkey % 5), 6) END
             AS safe_ratio,
           CASE WHEN o_totalprice > 100000 THEN NULL
                ELSE CAST(o_totalprice AS DECIMAL(8,2)) END AS safe_narrow,
           TRY_CAST(o_orderpriority AS BIGINT) AS not_a_number
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-tolerant arithmetic: this engine runs with
    spark.sql.ansi.enabled (strict SQL-standard errors), so the
    try_* family — try_divide (NULL on /0), try_cast (NULL on
    overflow / bad parse) — is the documented per-expression escape
    hatch, replacing the silent-corruption semantics of legacy mode.
    The oracle states each guard explicitly with CASE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 6
        ).alias("safe_ratio"),
        F.when(F.col("o_totalprice") > 100000, None)
        .otherwise(F.col("o_totalprice"))
        .try_cast("decimal(8,2)")
        .alias("safe_narrow"),
        F.col("o_orderpriority").try_cast("bigint").alias("not_a_number"),
    )


@register(
    "scalar_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 1365) AS toggled,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation function family (flag packing, hash mixing,
    bitmap membership): AND/OR/XOR, shifts, popcount — all JVM-native
    integer ops inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("toggled"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )
