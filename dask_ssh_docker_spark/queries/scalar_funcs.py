"""Scalar function surface (SURVEY.md §2.G): string / datetime / math /
conditional / array higher-order / JSON-map functions.

Dask exposes these as pandas Series accessors per partition ([Dask public
API], anchor ``/root/reference/dask_ssh_docker/__init__.py:307``); here each
family runs JVM-side through built-in ``pyspark.sql.functions`` so the whole
projection stays inside WholeStageCodegen — no Python in the hot path.

Oracle notes: every expression is written against the function pair that has
identical semantics in Spark SQL and DuckDB (e.g. Spark ``weekday`` =
DuckDB ``isodow - 1``; float functions rounded to absorb the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Strings (§2.G string accessor)
# ---------------------------------------------------------------------------


@query(
    "str_functions",
    oracle="""
    SELECT
      c_custkey,
      lower(c_name)                                   AS name_lower,
      upper(c_mktsegment)                             AS seg_upper,
      length(c_name)                                  AS name_len,
      substring(c_name, 10, 9)                        AS cust_num,
      CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS cust_num_int,
      replace(c_name, 'Customer#', 'C-')              AS name_replaced,
      concat_ws('|', c_mktsegment, c_name)            AS seg_name,
      contains(c_name, '00042')                       AS has_42,
      starts_with(c_mktsegment, 'BUI')                AS is_building,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS key_padded,
      trim('  ' || c_mktsegment || ' ')               AS seg_trimmed
    FROM customer
    """,
)
def str_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.str.*` accessor surface → built-in string functions."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint").alias("cust_num_int"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("name_replaced"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.contains(F.col("c_name"), F.lit("00042")).alias("has_42"),
        F.startswith(F.col("c_mktsegment"), F.lit("BUI")).alias("is_building"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trimmed"),
    )


@query(
    "str_split_explode",
    oracle="""
    SELECT p_partkey, word, word_pos
    FROM (
      SELECT p_partkey,
             unnest(string_split(p_name, ' ')) AS word,
             unnest(generate_series(1, len(string_split(p_name, ' ')))) AS word_pos
      FROM part
    )
    """,
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.str.split`` + explode-to-rows (one row per token, with position)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ")).alias("pos0", "word"),
    ).select(
        "p_partkey",
        "word",
        (F.col("pos0") + 1).cast("bigint").alias("word_pos"),
    )


# ---------------------------------------------------------------------------
# Datetime (§2.G dt accessor)
# ---------------------------------------------------------------------------


@query(
    "date_functions",
    oracle="""
    SELECT
      o_orderkey,
      year(o_orderdate)                              AS yr,
      month(o_orderdate)                             AS mo,
      day(o_orderdate)                               AS dom,
      isodow(o_orderdate) - 1                        AS weekday_mon0,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      strftime(o_orderdate, '%Y-%m')                 AS ym,
      CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
      datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
      CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)   AS order_day
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.dt.*` accessor surface → built-in datetime functions.

    Weekday uses Monday=0 (pandas convention) = Spark ``weekday`` =
    DuckDB ``isodow - 1``.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.weekday("o_orderdate").alias("weekday_mon0"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.to_date("o_orderdate").cast("timestamp").alias("order_day"),
    )


# ---------------------------------------------------------------------------
# Math + conditional (§2.G math / np.where idiom)
# ---------------------------------------------------------------------------


@query(
    "math_functions",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      abs(l_discount - 0.05)                    AS disc_dev,
      CAST(floor((CAST(round(l_extendedprice * 100) AS BIGINT) + 500)
                 / 1000.0) AS DOUBLE) / 100     AS price_k,
      CAST(floor(l_quantity / 10) AS BIGINT)    AS qty_decile,
      CAST(ceil(l_tax * 100) AS BIGINT)         AS tax_pct_ceil,
      round(sqrt(l_extendedprice), 6)           AS price_sqrt,
      round(ln(l_extendedprice + 1), 6)         AS price_ln,
      round(pow(1.0 + l_discount, 2), 6)        AS disc_compound,
      round(sin(l_quantity), 6)                 AS qty_sin,
      CASE WHEN l_discount > 0.05 THEN 'high'
           WHEN l_discount > 0.02 THEN 'mid'
           ELSE 'low' END                       AS disc_band,
      greatest(l_quantity, 25.0)                AS qty_floor25,
      least(l_tax, 0.04)                        AS tax_cap4
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy-ufunc-on-column surface → JVM math functions (rounded where
    the function is transcendental so the last ulp can't diverge)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        # exact half-up round of price/1000 to 2 dp via integer cents:
        # a 2-dp price / 1000 lands exactly on .xx5 boundaries, where
        # round(double) diverges across engines (Spark HALF_UPs the
        # shortest decimal repr, DuckDB rounds the binary double:
        # 19.435 → 19.44 vs 19.43), and DuckDB's `/` on DECIMALs returns
        # DOUBLE so decimal arithmetic can't carry the division either.
        # floor((cents+500)/1000)/100 is exact integer math in both
        # engines (the double division is safe: quotients sit ≥1e-3 from
        # integer boundaries, ~1e10 ulps at this magnitude).  Found by
        # the r10 zipf-corpus oracle sweep.
        (
            F.floor(
                (F.round(F.col("l_extendedprice") * 100).cast("bigint") + 500)
                / 1000.0
            ).cast("double")
            / 100
        ).alias("price_k"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 6).alias("disc_compound"),
        F.round(F.sin("l_quantity"), 6).alias("qty_sin"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_cap4"),
    )


# ---------------------------------------------------------------------------
# JSON / map (§2.G map/json; events.props)
# ---------------------------------------------------------------------------


@query(
    "json_extract_props",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string column (``events.props``) → typed extraction +
    aggregation.  ``from_json``/``get_json_object`` are the Spark side of
    the Dask dict-in-object-column idiom."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "json_map_schema",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
    """,
)
def json_map_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema → struct field access with a
    pushable predicate."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return (
        ev.withColumn("p", parsed)
        .select("event_id", F.col("p.k").alias("k_typed"))
        .filter(F.col("k_typed") >= 95)
    )


# ---------------------------------------------------------------------------
# Array higher-order functions (§2.G array)
# ---------------------------------------------------------------------------


@query(
    "array_higher_order",
    oracle="""
    SELECT
      p_partkey,
      COALESCE(array_to_string(words, '|'), '')         AS words,
      len(words)                                        AS n_words,
      COALESCE(array_to_string(list_transform(words, w -> upper(w)), '|'), '')
                                                        AS words_upper,
      COALESCE(array_to_string(list_filter(words, w -> length(w) > 4), '|'), '')
                                                        AS long_words,
      array_contains(words, 'red')                      AS has_red,
      CAST(list_aggregate(list_transform(words, w -> length(w)), 'sum') AS BIGINT)
                                                        AS total_chars,
      COALESCE(array_to_string(list_sort(list_distinct(words)), '|'), '')
                                                        AS uniq_sorted
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType + higher-order functions (transform/filter/aggregate) —
    richer than the Dask object-column equivalent, all JVM-side.

    Result-schema policy: ArrayType output columns are serialized with
    ``array_join(..., '|')`` (oracle ``array_to_string``) because the
    driver's canonicalizer cannot hash list cells (round-1 red row).
    The higher-order computation itself still runs on real arrays.
    """
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select("p_partkey", words.alias("words")).select(
        "p_partkey",
        F.array_join("words", "|").alias("words"),
        F.size("words").cast("bigint").alias("n_words"),
        F.array_join(
            F.transform("words", lambda w: F.upper(w)), "|"
        ).alias("words_upper"),
        F.array_join(
            F.filter("words", lambda w: F.length(w) > 4), "|"
        ).alias("long_words"),
        F.array_contains("words", "red").alias("has_red"),
        F.aggregate(
            F.transform("words", lambda w: F.length(w).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(F.array_sort(F.array_distinct("words")), "|").alias(
            "uniq_sorted"
        ),
    )


# ---------------------------------------------------------------------------
# Casting surface (§2.C astype)
# ---------------------------------------------------------------------------


@query(
    "cast_surface",
    oracle="""
    SELECT
      l_orderkey,
      CAST(l_quantity AS INTEGER)        AS qty_int,
      CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
      CAST(l_linenumber AS VARCHAR)      AS line_str,
      CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day,
      CAST(l_quantity > 25 AS BOOLEAN)   AS is_bulk
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
)
def cast_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``astype`` → ``cast`` across the numeric/string/date/bool lattice."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_day"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


@query(
    "str_functions_extended",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
           reverse(p_name)                     AS name_rev,
           repeat(p_brand, 2)                  AS brand_twice,
           instr(p_name, 'red')                AS red_pos,
           left(p_name, 3)                     AS head3,
           right(p_name, 3)                    AS tail3,
           ascii(p_type)                       AS first_char_code,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter
    FROM part
    """,
)
def str_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second tranche of the `.str` surface: translate/reverse/repeat/
    instr/left/right/ascii/chr."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.instr("p_name", "red").alias("red_pos"),
        F.substring("p_name", 1, 3).alias("head3"),
        F.substring("p_name", -3, 3).alias("tail3"),
        F.ascii("p_type").alias("first_char_code"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias("letter"),
    )


@query(
    "fuzzy_levenshtein_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    name_pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM names a JOIN names b
        ON a.p_name <> b.p_name
       AND abs(length(a.p_name) - length(b.p_name)) <= 2
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    )
    SELECT pa.p_partkey AS id_a, pb.p_partkey AS id_b,
           np.name_a, np.name_b, np.dist
    FROM name_pairs np
    JOIN part pa ON pa.p_name = np.name_a
    JOIN part pb ON pb.p_name = np.name_b
    WHERE pa.p_partkey < pb.p_partkey
    """,
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-duplicate names (edit distance ≤ 2, length-delta ≤ 2
    pre-filter), SCALE PATH: names repeat heavily, so the quadratic
    levenshtein comparison runs over DISTINCT names only (|names|² ≪
    |part|²), then expands back to id pairs through two hash equijoins.
    Semantics identical to the naive all-pairs self-join (verified: the
    r1-r3 registered form was exactly that, and both forms hash-match at
    sf0.01); wall-time at sf1 drops from a 2×10¹⁰-pair nested loop that
    never finishes to seconds.  For high-cardinality names compose this
    with length/prefix banding on the distinct-name join.

    Emission discipline: both orientations (n1,n2)/(n2,n1) survive the
    distinct-name join, so filtering the expansion on id_a<id_b keeps
    each unordered id pair exactly once with name_a = name(min id) —
    byte-identical to the naive form's `a.p_partkey < b.p_partkey`
    output."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = p.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    name_pairs = (
        a.join(
            b,
            (F.col("name_a") != F.col("name_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
    )
    pa = p.select(F.col("p_partkey").alias("__ka"), F.col("p_name").alias("name_a"))
    pb = p.select(F.col("p_partkey").alias("__kb"), F.col("p_name").alias("name_b"))
    expanded = name_pairs.join(pa, "name_a").join(pb, "name_b")
    return expanded.filter(F.col("__ka") < F.col("__kb")).select(
        F.col("__ka").alias("id_a"),
        F.col("__kb").alias("id_b"),
        "name_a",
        "name_b",
        "dist",
    )


@query(
    "numeric_format_conv",
    oracle="""
    SELECT o_orderkey,
           lower(to_hex(o_orderkey))     AS key_hex,
           bin(o_orderkey)               AS key_bin,
           printf('%.2f', o_totalprice)  AS price_str
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def numeric_format_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base conversion + fixed-point string formatting (Dask ``map`` with
    format strings → JVM conv/format_string).  bin() strips leading zeros
    in both engines; printf %.2f rounds half-even identically."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.lower(F.hex("o_orderkey")).alias("key_hex"),
        F.conv(F.col("o_orderkey").cast("string"), 10, 2).alias("key_bin"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
    )
