"""Scalar function-family coverage queries (SURVEY §2.7: the reference has
no string/date/math scalar library beyond vector math; this engine inherits
Spark's built-ins -- these queries pin the cross-engine semantics we rely
on for the families, oracle-checked).

Portability notes baked in:
  - day-of-week is NOT portable (Spark: 1=Sunday; DuckDB dow: 0=Sunday) --
    year/month/day/datediff are.
  - transcendental functions (log/exp/pow) can differ by 1 ulp across libm
    implementations -- outputs here are ~O(10) so 6-dp rounding absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .vector import normalize_float


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.lower(F.col("p_name")).alias("lower_name"),
            F.upper(F.col("p_brand")).alias("upper_brand"),
            F.length(F.col("p_name")).cast("long").alias("name_len"),
            F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
            F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
            F.instr(F.col("p_name"), "o").cast("long").alias("first_o"),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.trim(F.lpad(F.col("p_brand"), 12, "*")).alias("padded"),
        )
        .orderBy("p_partkey")
    )


def string_functions_oracle() -> str:
    return """
SELECT p_partkey,
       lower(p_name) AS lower_name,
       upper(p_brand) AS upper_brand,
       length(p_name)::BIGINT AS name_len,
       substr(p_type, 1, 5) AS type_prefix,
       p_brand || '/' || p_type AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CASE WHEN instr(p_name, 'o') IS NULL THEN 0 ELSE instr(p_name, 'o') END::BIGINT AS first_o,
       reverse(p_brand) AS brand_rev,
       trim(lpad(p_brand, 12, '*')) AS padded
FROM part
ORDER BY p_partkey
""".strip()


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.lit("1995-01-01").cast("timestamp")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("days_since_95"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.add_months(F.col("o_orderdate").cast("date"), 3).cast("timestamp").alias("plus_3mo"),
        )
        .orderBy("o_orderkey")
    )


def datetime_functions_oracle() -> str:
    return """
SELECT o_orderkey,
       year(o_orderdate)::BIGINT AS yr,
       month(o_orderdate)::BIGINT AS mo,
       day(o_orderdate)::BIGINT AS dom,
       quarter(o_orderdate)::BIGINT AS qtr,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)::BIGINT AS days_since_95,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       (o_orderdate::DATE + INTERVAL 3 MONTH)::TIMESTAMP AS plus_3mo
FROM orders
ORDER BY o_orderkey
""".strip()


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    price = F.col("l_extendedprice")
    return (
        li.select(
            "l_orderkey",
            normalize_float(F.sqrt(price)).alias("sqrt_price"),
            normalize_float(F.log(price)).alias("ln_price"),
            normalize_float(F.pow(F.col("l_discount"), 2)).alias("disc_sq"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            normalize_float(F.ceil(price / 1000).cast("double"), None).alias("price_k_ceil"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("mod7"),
            F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
        )
        .orderBy("l_orderkey")
    )


def math_functions_oracle() -> str:
    return """
SELECT l_orderkey,
       (round(sqrt(l_extendedprice), 6) + 0.0) AS sqrt_price,
       (round(ln(l_extendedprice), 6) + 0.0) AS ln_price,
       (round(pow(l_discount, 2), 6) + 0.0) AS disc_sq,
       abs(l_quantity - 25) AS qty_dev,
       (ceil(l_extendedprice / 1000)::DOUBLE + 0.0) AS price_k_ceil,
       (l_orderkey % 7)::BIGINT AS mod7,
       greatest(l_tax, l_discount) AS max_rate
FROM lineitem
WHERE l_linenumber = 1
ORDER BY l_orderkey
""".strip()


def array_functions(spark: SparkSession, sf_dir: str, top: int = 3, n_vecs: int = 100) -> DataFrame:
    """Array function family over the embedding column: per vector, the
    top-|component| entries as exploded (vec_id, rank, pos, component)
    rows. Rank ties break on position; components are rounded for
    cross-engine parity; explode keeps outputs scalar (array-valued output
    columns don't hash portably across engines).
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < n_vecs)
    exploded = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        normalize_float(F.col("x")).alias("component"),
        normalize_float(F.abs(F.col("x"))).alias("absx"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("absx"), "pos")
    return (
        exploded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select("vec_id", "rank", "pos", "component")
        .orderBy("vec_id", "rank")
    )


def array_functions_oracle(top: int = 3, n_vecs: int = 100) -> str:
    return f"""
WITH exploded AS (
  SELECT vec_id, i AS pos,
         (round(v[i], 6) + 0.0) AS component,
         (round(abs(v[i]), 6) + 0.0) AS absx
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {n_vecs}),
       unnest(range(1, 65)) AS t(i)),
ranked AS (
  SELECT vec_id, pos, component,
         row_number() OVER (PARTITION BY vec_id ORDER BY absx DESC, pos) AS rank
  FROM exploded)
SELECT vec_id, rank, pos, component
FROM ranked WHERE rank <= {top}
ORDER BY vec_id, rank
""".strip()


def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / coalesce / nullif / least / greatest family over orders --
    pure branching on already-materialized values, no float arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", "hot")
            .when(F.col("o_orderpriority") == "2-HIGH", "warm")
            .otherwise("cold")
            .alias("priority_class"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
                "status_or_open"
            ),
            F.least(F.col("o_totalprice"), F.lit(50000.0)).alias("capped_price"),
            F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floored_price"),
            (F.col("o_orderstatus") == "F").cast("boolean").alias("is_final"),
        )
        .orderBy("o_orderkey")
    )


def conditional_functions_oracle() -> str:
    return """
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
            WHEN o_orderpriority = '2-HIGH' THEN 'warm'
            ELSE 'cold' END AS priority_class,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       least(o_totalprice, 50000.0) AS capped_price,
       greatest(o_totalprice, 1000.0) AS floored_price,
       (o_orderstatus = 'F') AS is_final
FROM orders
ORDER BY o_orderkey
""".strip()


def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / match / count / split-index. Patterns avoid
    engine-specific syntax (no lookaround, POSIX classes only)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_lower_run"),
            F.regexp_extract(F.col("p_brand"), "#([0-9]+)", 1).alias("brand_num"),
            F.col("p_type").rlike("^(PROMO|SMALL)").alias("is_promo_small"),
            F.regexp_count(F.col("p_name"), F.lit("[0-9]")).cast("long").alias("n_digits"),
            F.element_at(F.split(F.col("p_name"), "_"), 1).alias("name_head"),
            F.element_at(F.split(F.col("p_name"), "_"), -1).alias("name_tail"),
        )
        .orderBy("p_partkey")
    )


def regex_functions_oracle() -> str:
    return """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_lower_run,
       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
       regexp_matches(p_type, '^(PROMO|SMALL)') AS is_promo_small,
       len(regexp_extract_all(p_name, '[0-9]'))::BIGINT AS n_digits,
       str_split(p_name, '_')[1] AS name_head,
       str_split(p_name, '_')[-1] AS name_tail
FROM part
ORDER BY p_partkey
""".strip()


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY §1.2: the reference's Metadata is a flat
    string-keyed map; §1.4 maps it to MapType). Exercises the map function
    family on REAL parsed data -- events.props JSON -> map<string,string> --
    plus constructed maps: size, keys, element_at (present and MISSING key,
    the F1 trap: missing -> NULL), map_concat, map_contains_key. The oracle
    reaches the same values through DuckDB's JSON path functions, so the
    map semantics this engine relies on for metadata filtering are pinned
    cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    # top-200 FIRST (TakeOrderedAndProject on the raw columns), JSON-parse
    # after: parsing props for every event before a limit-200 was the
    # query's entire cost (100k from_json calls for 200 output rows)
    top = ev.select("event_id", "props", "event_type").orderBy("event_id").limit(200)
    props = F.from_json(F.col("props"), "map<string,string>")
    meta = F.create_map(F.lit("type"), F.col("event_type"))
    # meta wins on key collision: filter any pre-existing 'type' key out of
    # props first, since map_concat THROWS on duplicates under Spark's
    # default EXCEPTION dedup policy -- last-write-wins semantics without
    # depending on the generator never emitting a 'type' prop
    merged = F.map_concat(F.map_filter(props, lambda k, _: k != "type"), meta)
    return (
        top.select(
            "event_id",
            F.size(props).cast("long").alias("n_props"),
            F.element_at(props, "k").cast("long").alias("k_value"),
            F.coalesce(F.element_at(props, "missing"), F.lit("<absent>")).alias(
                "missing_value"
            ),
            F.size(merged).cast("long").alias("n_merged"),
            F.element_at(merged, "type").alias("merged_type"),
            F.map_contains_key(props, "k").alias("has_k"),
            F.array_join(F.array_sort(F.map_keys(merged)), ",").alias("keys_sorted"),
        )
        .orderBy("event_id")
    )


def map_functions_oracle() -> str:
    # every map-shaped value is DERIVED from the JSON payload (json_keys),
    # never hardcoded to the generator's current props shape -- the gate
    # checks map semantics, not the fixture
    return """
SELECT event_id,
       len(json_keys(props))::BIGINT AS n_props,
       json_extract_string(props, '$.k')::BIGINT AS k_value,
       coalesce(json_extract_string(props, '$.missing'), '<absent>') AS missing_value,
       len(list_distinct(list_filter(json_keys(props), k -> k != 'type') || ['type']))::BIGINT
         AS n_merged,
       event_type AS merged_type,
       list_contains(json_keys(props), 'k') AS has_k,
       array_to_string(list_sort(list_filter(json_keys(props), k -> k != 'type') || ['type']), ',')
         AS keys_sorted
FROM events
ORDER BY event_id
LIMIT 200
""".strip()
