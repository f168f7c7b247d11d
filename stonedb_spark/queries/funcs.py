"""Scalar-function battery — SURVEY.md §2.8.

The reference's scalar surface is MySQL 5.7's function library (it
delegates to MySQL's Item evaluator, storage/tianmu/core/
mysql_expression.cpp).  Each query here exercises a family from the
Tianmu function-test corpus through the stonedb_spark.functions.mysql
dialect shims, with the DuckDB oracle expressing the identical
semantics in DuckDB's own dialect (strftime C codes, trunc, etc.).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stonedb_spark.catalog import load_tables
from stonedb_spark.functions import mysql as my
from stonedb_spark.queries import register


# --------------------------------------------------------------------------
# Date/time extraction family (day_func.test, hour_func.test, week*.test,
# last_day.test, yearweek_func.test).
@register(
    "func_datetime_extract",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT)    AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS INT)   AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INT)     AS d,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
       CAST(EXTRACT(dayofyear FROM o_orderdate) AS INT) AS doy,
       CAST(EXTRACT(isodow FROM o_orderdate) % 7 + 1 AS INT) AS dow_mysql,
       CAST(EXTRACT(isodow FROM o_orderdate) - 1 AS INT)     AS weekday_mysql,
       CAST(EXTRACT(week FROM o_orderdate) AS INT)    AS iso_week,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS last_dom,
       DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate)  AS days_since_epoch_start
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
""",
    doc="YEAR/MONTH/DAY/QUARTER/DAYOFYEAR/DAYOFWEEK/WEEKDAY/WEEK/LAST_DAY/DATEDIFF",
)
def func_datetime_extract(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    d = o["o_orderdate"]
    return (
        o.filter(o["o_orderkey"] <= 200)
        .select(
            "o_orderkey",
            F.year(d).alias("y"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("d"),
            F.quarter(d).alias("q"),
            F.dayofyear(d).alias("doy"),
            my.dayofweek(d).alias("dow_mysql"),
            my.weekday(d).cast("int").alias("weekday_mysql"),
            my.week_iso(d).alias("iso_week"),
            my.last_day(d).cast("timestamp").alias("last_dom"),
            my.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch_start"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# DATE_FORMAT with MySQL % codes (date_formats_func.test) — the shim
# translates to JVM patterns; DuckDB oracle uses C strftime codes.
@register(
    "func_date_format",
    oracle="""
SELECT event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS full_dt,
       STRFTIME(ts, '%d/%m/%y')          AS dmy,
       STRFTIME(ts, '%H:%M')             AS hm,
       STRFTIME(ts, '%j')                AS doy_str
FROM events
WHERE event_id <= 100
ORDER BY event_id
""",
    doc="DATE_FORMAT %-code translation (MySQL %i/%s vs C %M/%S)",
)
def func_date_format(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    e = t["events"]
    return (
        e.filter(e["event_id"] <= 100)
        .select(
            "event_id",
            my.date_format(e["ts"], "%Y-%m-%d %H:%i:%s").alias("full_dt"),
            my.date_format(e["ts"], "%d/%m/%y").alias("dmy"),
            my.date_format(e["ts"], "%H:%i").alias("hm"),
            my.date_format(e["ts"], "%j").alias("doy_str"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# String-function family (concat_func.test, char_length.test,
# left_right_mid_substring_func.test, replace.test, ascii_func.test).
@register(
    "func_string",
    oracle="""
SELECT p_partkey,
       p_name || '/' || p_brand                    AS concatenated,
       LENGTH(p_name)                              AS clen,
       UPPER(p_name)                               AS up,
       LOWER(p_brand)                              AS lo,
       SUBSTRING(p_name, 1, 4)                     AS l4,
       SUBSTRING(p_name, LENGTH(p_name) - 2, 3)    AS r3,
       SUBSTRING(p_name, 2, 5)                     AS m25,
       REPLACE(p_name, ' ', '_')                   AS underscored,
       REVERSE(p_brand)                            AS rev,
       STRPOS(p_name, 'e')                         AS pos_e,
       ASCII(p_name)                               AS first_ascii,
       LPAD(CAST(p_partkey AS VARCHAR), 8, '0')    AS padded,
       TRIM('  ' || p_brand || ' ')                AS trimmed,
       REPEAT('ab', 3)                             AS rpt
FROM part
WHERE p_partkey <= 100
ORDER BY p_partkey
""",
    doc="CONCAT/LENGTH/UPPER/LOWER/LEFT/RIGHT/MID/REPLACE/REVERSE/INSTR/ASCII/LPAD/TRIM/REPEAT",
)
def func_string(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t["part"]
    name, brand = p["p_name"], p["p_brand"]
    return (
        p.filter(p["p_partkey"] <= 100)
        .select(
            "p_partkey",
            F.concat(name, F.lit("/"), brand).alias("concatenated"),
            F.char_length(name).cast("long").alias("clen"),
            F.upper(name).alias("up"),
            F.lower(brand).alias("lo"),
            my.left(name, 4).alias("l4"),
            my.right(name, 3).alias("r3"),
            my.mid(name, 2, 5).alias("m25"),
            F.replace(name, F.lit(" "), F.lit("_")).alias("underscored"),
            F.reverse(brand).alias("rev"),
            F.instr(name, "e").cast("long").alias("pos_e"),
            F.ascii(name).alias("first_ascii"),
            F.lpad(p["p_partkey"].cast("string"), 8, "0").alias("padded"),
            F.trim(F.concat(F.lit("  "), brand, F.lit(" "))).alias("trimmed"),
            F.repeat(F.lit("ab"), 3).alias("rpt"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Math family (func_math.test, div_func.test, mod_func.test,
# truncate_func.test).  Transcendentals are rounded to 9 decimals on
# both sides — libm vs JVM can differ in the last ulp.
@register(
    "func_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25.0)                        AS abs_dev,
       CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT)  AS ceil_k,
       CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS floor_k,
       CAST(ROUND(CAST(l_extendedprice * l_discount AS DECIMAL(38,10)), 2) AS DOUBLE) AS rounded,
       CAST(l_orderkey % 97 AS BIGINT)               AS mod97,
       CAST(TRUNC(CAST(l_orderkey AS DOUBLE) / 7.0) AS BIGINT) AS div7,
       CAST(TRUNC(CAST(l_extendedprice * 0.01 AS DECIMAL(38,9)) * 100) / 100.0 AS DOUBLE) AS trunc2,
       ROUND(SQRT(l_extendedprice), 9)               AS sq,
       ROUND(LN(l_extendedprice + 1.0), 9)           AS lnp,
       ROUND(POWER(l_quantity, 2.0), 9)              AS pw,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE)       AS sg,
       GREATEST(l_quantity, l_extendedprice * 0.001) AS gr,
       LEAST(l_tax, l_discount)                      AS le
FROM lineitem
WHERE l_orderkey <= 120
ORDER BY l_orderkey, l_linenumber
""",
    doc="ABS/CEIL/FLOOR/ROUND/MOD/DIV/TRUNCATE/SQRT/LN/POWER/SIGN/GREATEST/LEAST",
)
def func_math(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]  # noqa: E741
    price, qty = l["l_extendedprice"], l["l_quantity"]
    return (
        l.filter(l["l_orderkey"] <= 120)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(qty - 25.0).alias("abs_dev"),
            F.ceil(price / 1000.0).alias("ceil_k"),
            F.floor(price / 1000.0).alias("floor_k"),
            # double ROUND diverges across engines on half-way products
            # (binary expansion vs shortest-decimal); round the exact
            # DECIMAL intermediate instead, like every money aggregate.
            F.round((price * l["l_discount"]).cast("decimal(38,10)"), 2)
            .cast("double").alias("rounded"),
            (l["l_orderkey"] % 97).cast("long").alias("mod97"),
            my.div(l["l_orderkey"], F.lit(7)).alias("div7"),
            my.truncate(price * 0.01, 2).alias("trunc2"),
            F.round(F.sqrt(price), 9).alias("sq"),
            F.round(F.log(price + 1.0), 9).alias("lnp"),
            F.round(F.pow(qty, F.lit(2.0)), 9).alias("pw"),
            F.signum(l["l_discount"] - 0.05).alias("sg"),
            F.greatest(qty, price * 0.001).alias("gr"),
            F.least(l["l_tax"], l["l_discount"]).alias("le"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Control flow + null handling (flow_control_function.test,
# case_function.test, coalesce.test, empty_string_not_null.test).
@register(
    "func_control_null",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal > 5000 THEN 'rich'
            WHEN c_acctbal > 0 THEN 'ok' ELSE 'broke' END AS klass,
       IFNULL(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')  AS seg_masked,
       COALESCE(NULLIF(c_name, ''), 'unnamed')            AS name_nz,
       (c_name = '')                                      AS empty_not_null,
       CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE -c_acctbal END AS abs_if
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
    doc="IF/IFNULL/NULLIF/COALESCE/CASE + empty-string-is-not-NULL semantics",
)
def func_control_null(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    return (
        c.filter(c["c_custkey"] <= 300)
        .select(
            "c_custkey",
            F.when(c["c_acctbal"] > 5000, "rich")
            .when(c["c_acctbal"] > 0, "ok")
            .otherwise("broke")
            .alias("klass"),
            my.ifnull(my.nullif(c["c_mktsegment"], F.lit("BUILDING")), F.lit("OTHER")).alias(
                "seg_masked"
            ),
            F.coalesce(my.nullif(c["c_name"], F.lit("")), F.lit("unnamed")).alias("name_nz"),
            (c["c_name"] == "").alias("empty_not_null"),
            my.if_(c["c_acctbal"] >= 0, c["c_acctbal"], -c["c_acctbal"]).alias("abs_if"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Casts + base conversion + hashes (cast_convert_conv_function.test,
# md5_function.test).
@register(
    "func_cast_conv_hash",
    oracle="""
SELECT s_suppkey,
       CAST(TRUNC(s_acctbal + 0.5 * SIGN(s_acctbal)) AS BIGINT) AS bal_int,
       CAST(s_suppkey AS VARCHAR)                  AS key_str,
       CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT)  AS roundtrip,
       UPPER(TO_HEX(s_suppkey))                    AS hex_key,
       BIN(s_suppkey)                              AS bin_key,
       MD5(s_name)                                 AS name_md5,
       SHA256(s_name)                              AS name_sha256
FROM supplier
ORDER BY s_suppkey
""",
    doc="CAST roundtrips, CONV base conversion, MD5/SHA2",
)
def func_cast_conv_hash(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    s = t["supplier"]
    return s.select(
        "s_suppkey",
        # MySQL CAST(double AS SIGNED) rounds half away from zero, as do
        # DuckDB CAST(double AS BIGINT) and Spark F.round; Spark's bare
        # cast truncates, hence the explicit round-then-cast.
        F.round(s["s_acctbal"], 0).cast("long").alias("bal_int"),
        s["s_suppkey"].cast("string").alias("key_str"),
        s["s_suppkey"].cast("string").cast("long").alias("roundtrip"),
        my.conv(s["s_suppkey"].cast("string"), 10, 16).alias("hex_key"),
        my.conv(s["s_suppkey"].cast("string"), 10, 2).alias("bin_key"),
        my.md5(s["s_name"]).alias("name_md5"),
        my.sha256(s["s_name"]).alias("name_sha256"),
    ).orderBy("s_suppkey")


# --------------------------------------------------------------------------
# PERIOD_DIFF + SEC_TO_TIME + TIMESTAMPDIFF arithmetic
# (period_diff_function.test, sec_to_time_function.test,
# timestampadd_func.test).
@register(
    "func_period_time",
    oracle="""
SELECT event_id,
       (CAST(STRFTIME(ts, '%Y%m') AS BIGINT) // 100) * 12
         + CAST(STRFTIME(ts, '%Y%m') AS BIGINT) % 100
         - ((199501 // 100) * 12 + 199501 % 100)      AS months_since,
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 86400 // 3600 AS VARCHAR), 2, '0')
         || ':' ||
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 3600 // 60 AS VARCHAR), 2, '0')
         || ':' ||
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 60 AS VARCHAR), 2, '0')
                                                      AS tod,
       DATE_DIFF('day', TIMESTAMP '2024-01-01', ts)   AS days_into_jan
FROM events
WHERE event_id <= 100
ORDER BY event_id
""",
    doc="PERIOD_DIFF / SEC_TO_TIME / TIMESTAMPDIFF(DAY) arithmetic",
)
def func_period_time(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    e = t["events"]
    period = F.date_format(e["ts"], "yyyyMM").cast("long")
    secs_of_day = e["ts"].cast("long") % 86400
    return (
        e.filter(e["event_id"] <= 100)
        .select(
            "event_id",
            my.period_diff(period, F.lit(199501)).alias("months_since"),
            my.sec_to_time(secs_of_day).alias("tod"),
            F.datediff(e["ts"].cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("days_into_jan"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Date/time arithmetic battery: ADDDATE/SUBDATE/DATE_ADD(MONTH)/ADDTIME/
# TIMESTAMPADD/TIMEDIFF (MTR: adddate_func.test, addtime_function.test,
# timediff.test, timestampadd_func.test).  All pure Catalyst interval
# arithmetic; TIMEDIFF reuses the SEC_TO_TIME shim (hours unwrapped).
@register(
    "func_date_arith",
    oracle="""
WITH e AS (
  SELECT event_id, ts, CAST(ts AS DATE) AS d FROM events WHERE event_id <= 100
)
SELECT event_id,
       CAST(CAST(d + INTERVAL 7 DAY AS DATE) AS VARCHAR)   AS plus7,
       CAST(CAST(d - INTERVAL 7 DAY AS DATE) AS VARCHAR)   AS minus7,
       CAST(CAST(d + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS plus2m,
       ts + INTERVAL 5400 SECOND          AS addtime_90m,
       ts + INTERVAL 3 HOUR               AS tsadd_3h,
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 86400 // 3600 AS VARCHAR), 2, '0')
         || ':' ||
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 3600 // 60 AS VARCHAR), 2, '0')
         || ':' ||
       LPAD(CAST(CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) % 60 AS VARCHAR), 2, '0')
                                          AS tdiff_midnight
FROM e
ORDER BY event_id
""",
    doc="ADDDATE/SUBDATE/ADD_MONTHS/ADDTIME/TIMESTAMPADD/TIMEDIFF",
)
def func_date_arith(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    e = t["events"]
    d = e["ts"].cast("date")
    return (
        e.filter(e["event_id"] <= 100)
        .select(
            "event_id",
            my.adddate(d, 7).cast("string").alias("plus7"),
            my.subdate(d, 7).cast("string").alias("minus7"),
            my.add_months_(d, 2).cast("string").alias("plus2m"),
            my.addtime(e["ts"], 5400).alias("addtime_90m"),
            my.timestampadd("HOUR", 3, e["ts"]).alias("tsadd_3h"),
            my.timediff(e["ts"], F.date_trunc("day", e["ts"])).alias("tdiff_midnight"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# All-mode WEEK/YEARWEEK (week_func/weekofyear_func/yearweek_func tests).
# The reference evaluates these through MySQL's Item_func_week
# (SURVEY §2.8 delegation); here the 8-mode algorithm is pure Column
# expressions (functions/mysql.py _calc_week — codegen, no UDF).  Modes
# 0/1/3 + ISO yearweek are oracle-checked here in DuckDB's dialect; the
# full 8-mode × 13-year matrix is pinned against an independent Python
# oracle in tests/test_funcs.py.
@register(
    "func_week_modes",
    oracle="""
SELECT o_orderkey,
       CAST(CASE WHEN doy < fsd THEN 0 ELSE (doy - fsd) // 7 + 1 END AS INT) AS week_m0,
       CAST(CASE WHEN d < w1m1 THEN 0
            ELSE DATE_DIFF('day', w1m1, d) // 7 + 1 END AS INT)              AS week_m1,
       CAST(WEEK(d) AS INT)                                                  AS week_m3,
       CAST(ISOYEAR(d) * 100 + WEEK(d) AS BIGINT)                            AS yearweek_m3
FROM (
    SELECT o_orderkey,
           o_orderdate AS d,
           DAYOFYEAR(o_orderdate) AS doy,
           1 + (7 - DAYOFWEEK(DATE_TRUNC('year', o_orderdate))) % 7 AS fsd,
           MAKE_DATE(YEAR(o_orderdate), 1, 4)
             - CAST(ISODOW(MAKE_DATE(YEAR(o_orderdate), 1, 4)) - 1 AS INT) AS w1m1
    FROM orders WHERE o_orderkey <= 400
)
ORDER BY o_orderkey
""",
    doc="WEEK modes 0/1/3 + YEARWEEK(d,3) — MySQL week-mode dialect shim",
)
def func_week_modes(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    d = o["o_orderdate"]
    return (
        o.filter(o["o_orderkey"] <= 400)
        .select(
            "o_orderkey",
            my.week(d, 0).alias("week_m0"),
            my.week(d, 1).alias("week_m1"),
            my.week(d, 3).alias("week_m3"),
            my.yearweek(d, 3).alias("yearweek_m3"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# JSON property extraction (MySQL 5.7 JSON_EXTRACT / ->> surface; the
# reference routes JSON to MySQL — limits.md lists the json TYPE as
# unsupported — so this is the dialect function, evaluated here with
# Spark's native get_json_object/from_json, no UDF).  Training-data
# pipelines lean on exactly this for sidecar metadata columns.
@register(
    "func_json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT)          AS k,
       CAST(json_extract_string(props, '$.k') AS INT) % 10     AS k_bucket,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
            THEN 'hi' ELSE 'lo' END                            AS k_band
FROM events
WHERE event_id <= 300
ORDER BY event_id
""",
    doc="JSON_EXTRACT dialect: get_json_object + typed from_json over props",
)
def func_json_extract(spark, sf_dir):
    from pyspark.sql.types import IntegerType, StructField, StructType

    t = load_tables(spark, sf_dir)
    e = t["events"]
    parsed = F.from_json(
        F.col("props"), StructType([StructField("k", IntegerType())])
    )
    k = parsed["k"]
    return (
        e.filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            k.alias("k"),
            (k % 10).alias("k_bucket"),
            F.get_json_object(F.col("props"), "$.missing").alias("absent"),
            F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# DAYNAME / MONTHNAME (dayname_func.test, monthname_func.test) — full
# English names via JVM date_format; DuckDB has the same functions
# natively.
@register(
    "func_day_month_name",
    oracle="""
SELECT o_orderkey,
       dayname(o_orderdate)   AS dn,
       monthname(o_orderdate) AS mn,
       CASE WHEN dayname(o_orderdate) IN ('Saturday', 'Sunday')
            THEN 1 ELSE 0 END AS is_weekend
FROM orders
WHERE o_orderkey <= 300
ORDER BY o_orderkey
""",
    doc="DAYNAME/MONTHNAME English names + weekend classification",
)
def func_day_month_name(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    d = o["o_orderdate"]
    return (
        o.filter(o["o_orderkey"] <= 300)
        .select(
            "o_orderkey",
            my.dayname(d).alias("dn"),
            my.monthname(d).alias("mn"),
            F.when(my.dayname(d).isin("Saturday", "Sunday"), 1)
            .otherwise(0)
            .alias("is_weekend"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Unsigned BIGINT arithmetic + ZEROFILL display (unsigned_math.test,
# bigint_unsigned.test, zerofill.test).  Spark has no unsigned 64-bit
# type; the shims carry the full 0..2^64-1 domain exactly in
# DECIMAL(20,0).  Values near 2^64 would lose precision through the
# harness's decimal→float fallback, so exact results are emitted as
# strings; the modulus (always < divisor < 2^53 here) stays numeric.
@register(
    "func_unsigned_math",
    oracle="""
SELECT o_orderkey,
       CAST(CAST(18446744073709551615 AS HUGEINT) - o_orderkey * 3 AS VARCHAR) AS u_str,
       CAST((CAST(18446744073709551615 AS HUGEINT) - o_orderkey * 3)
            // CAST(o_orderkey % 1000 + 7 AS HUGEINT) AS VARCHAR)              AS q_str,
       CAST((CAST(18446744073709551615 AS HUGEINT) - o_orderkey * 3)
            %  CAST(o_orderkey % 1000 + 7 AS HUGEINT) AS DOUBLE)               AS m,
       CASE WHEN length(CAST(o_orderkey AS VARCHAR)) >= 4
            THEN CAST(o_orderkey AS VARCHAR)
            ELSE lpad(CAST(o_orderkey AS VARCHAR), 4, '0') END                 AS z4
FROM orders
WHERE o_orderkey <= 400
ORDER BY o_orderkey
""",
    doc="unsigned u64 DIV/MOD exact in DECIMAL(20,0); ZEROFILL overflow guard",
)
def func_unsigned_math(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    u64_max = F.expr("CAST('18446744073709551615' AS DECIMAL(20,0))")
    u = my.unsigned(u64_max - o["o_orderkey"] * 3)
    b = my.unsigned(o["o_orderkey"] % 1000 + 7)
    return (
        o.filter(o["o_orderkey"] <= 400)
        .select(
            "o_orderkey",
            u.cast("string").alias("u_str"),
            my.udiv(u, b).cast("string").alias("q_str"),
            my.umod(u, b).cast("double").alias("m"),
            my.zerofill(o["o_orderkey"], 4).alias("z4"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Base-conversion / bit-display / transcendental family (func_bit.test,
# func_math.test corpus: BIN/OCT/HEX/UNHEX, LOG2/LOG10, DEGREES/RADIANS/
# COT, STRCMP, FORMAT).  Transcendentals rounded to 9 decimals on both
# sides (libm vs JVM last-ulp).  FORMAT restricted to integral input —
# see functions.mysql.format_int for the float trap.
@register(
    "func_base_convert",
    oracle="""
SELECT s_suppkey,
       bin(s_suppkey * 5 + 2)                         AS b2,
       to_base(s_suppkey * 5 + 2, 8)                  AS b8,
       hex(s_suppkey * 5 + 2)                         AS b16,
       hex(s_name)                                    AS name_hex,
       decode(unhex(hex(s_name)))                     AS name_roundtrip,
       format('{:,}', CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS acct_cents_fmt,
       ROUND(log2(s_suppkey * 5 + 2), 9)              AS l2,
       ROUND(log10(s_suppkey * 5 + 2), 9)             AS l10,
       ROUND(degrees(s_acctbal / 1000.0), 9)          AS deg,
       ROUND(radians(CAST(s_suppkey AS DOUBLE)), 9)   AS rad,
       ROUND(cot(s_suppkey + 0.5), 9)                 AS ct,
       CASE WHEN s_name < reverse(s_name) THEN -1
            WHEN s_name > reverse(s_name) THEN 1 ELSE 0 END AS sc
FROM supplier
WHERE s_suppkey <= 300
ORDER BY s_suppkey
""",
    doc="BIN/OCT/HEX/UNHEX/FORMAT/LOG2/LOG10/DEGREES/RADIANS/COT/STRCMP",
)
def func_base_convert(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    s = t["supplier"]
    n = s["s_suppkey"] * 5 + 2
    return (
        s.filter(s["s_suppkey"] <= 300)
        .select(
            "s_suppkey",
            my.bin_(n).alias("b2"),
            my.oct_(n).alias("b8"),
            my.hex_(n).alias("b16"),
            my.hex_(s["s_name"]).alias("name_hex"),
            my.unhex_str(my.hex_(s["s_name"])).alias("name_roundtrip"),
            my.format_int(F.round(s["s_acctbal"] * 100)).alias("acct_cents_fmt"),
            F.round(F.log2(n), 9).alias("l2"),
            F.round(F.log(10.0, n), 9).alias("l10"),
            F.round(F.degrees(s["s_acctbal"] / 1000.0), 9).alias("deg"),
            F.round(F.radians(s["s_suppkey"].cast("double")), 9).alias("rad"),
            F.round(my.cot(s["s_suppkey"] + 0.5), 9).alias("ct"),
            my.strcmp(s["s_name"], F.reverse(s["s_name"])).alias("sc"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# MySQL string-library battery #2 (the reference evaluates the FULL
# MySQL 5.7 Item library by delegation, mysql_expression.cpp — so
# SUBSTRING_INDEX / FIND_IN_SET / ELT / FIELD / INSERT are in scope
# even without a dedicated tianmu MTR file).  All native Spark
# builtins; the DuckDB oracle rebuilds each from list functions.
# MySQL FIELD() returns 0 when absent — Spark array_position already
# does; DuckDB list_position yields NULL → COALESCE.
@register(
    "func_string_list",
    oracle="""
WITH t AS (
  SELECT p_partkey, p_name, p_brand,
         replace(p_name, ' ', ',') AS csv
  FROM part WHERE p_partkey <= 300
)
SELECT p_partkey,
       array_to_string((string_split(csv, ','))[1:2], ',')   AS first2,
       (string_split(csv, ','))[-1]                          AS last1,
       CAST(COALESCE(list_position(string_split(csv, ','), 'green'), 0) AS BIGINT) AS pos_green,
       (['alpha','beta','gamma'])[1 + p_partkey % 3]         AS elt_pick,
       CAST(COALESCE(list_position(['Brand#12','Brand#23','Brand#34'], p_brand), 0) AS BIGINT) AS brand_field,
       substr(p_name, 1, 2) || '<X>' || substr(p_name, 5)    AS overlaid
FROM t ORDER BY p_partkey
""",
    doc="SUBSTRING_INDEX/FIND_IN_SET/ELT/FIELD/INSERT-overlay battery",
)
def func_string_list(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t["part"]
    csv = F.replace(F.col("p_name"), F.lit(" "), F.lit(","))
    return (
        p.filter(p["p_partkey"] <= 300)
        .select(
            "p_partkey",
            F.substring_index(csv, ",", 2).alias("first2"),
            F.substring_index(csv, ",", -1).alias("last1"),
            F.expr("find_in_set('green', replace(p_name, ' ', ','))")
            .cast("long")
            .alias("pos_green"),
            F.elt(
                (F.col("p_partkey") % 3 + 1).cast("int"),
                F.lit("alpha"), F.lit("beta"), F.lit("gamma"),
            ).alias("elt_pick"),
            F.array_position(
                F.array(F.lit("Brand#12"), F.lit("Brand#23"), F.lit("Brand#34")),
                F.col("p_brand"),
            ).alias("brand_field"),
            F.overlay(F.col("p_name"), F.lit("<X>"), 3, 2).alias("overlaid"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# BIT(n) column semantics (bit_type.test, alter_bit.test): a BIT(3)
# flag column synthesized from lineitem predicates, compared and
# aggregated numerically (BIT_AND/OR/XOR are Catalyst builtins over
# longs) and displayed as zero-padded bit strings.  ColumnType::BIT,
# common/common_definitions.h:47-76.
@register(
    "func_bit_type",
    oracle="""
WITH b AS (
  SELECT l_orderkey,
         CASE WHEN CAST(ROUND(l_quantity * 100) AS BIGINT) > 2500 THEN 4 ELSE 0 END
         + CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) > 5 THEN 2 ELSE 0 END
         + CASE WHEN CAST(ROUND(l_tax * 100) AS BIGINT) > 4 THEN 1 ELSE 0 END AS flags
  FROM lineitem WHERE l_orderkey <= 600
)
SELECT l_orderkey,
       COUNT(*) AS n,
       CAST(BIT_AND(flags) AS BIGINT) AS f_and,
       CAST(BIT_OR(flags) AS BIGINT) AS f_or,
       CAST(BIT_XOR(flags) AS BIGINT) AS f_xor,
       LPAD(BIN(BIT_OR(flags)), 3, '0') AS f_or_bits,
       CAST(SUM(CASE WHEN flags >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_highbit
FROM b
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
    doc="BIT(n) type: b'..' ingest range, numeric compare, BIT_AND/OR/XOR, bit display",
)
def func_bit_type(spark, sf_dir):
    from stonedb_spark.functions import bittype as BT

    t = load_tables(spark, sf_dir)
    l = t["lineitem"]  # noqa: E741
    # Predicates on scaled-integer cents, not raw doubles: boundary rows
    # (a discount of exactly 0.05) would otherwise hinge on how each
    # engine types the 0.05 literal (decimal vs double), which differs
    # across DuckDB versions — integer compares are engine-invariant.
    def cents(c):
        return F.round(c * 100).cast("long")

    flags = BT.bit_cast(
        F.when(cents(l["l_quantity"]) > 2500, 4).otherwise(0)
        + F.when(cents(l["l_discount"]) > 5, 2).otherwise(0)
        + F.when(cents(l["l_tax"]) > 4, 1).otherwise(0),
        3,
    )
    return (
        l.filter(l["l_orderkey"] <= 600)
        .select(l["l_orderkey"], flags.alias("flags"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_and("flags").alias("f_and"),
            F.bit_or("flags").alias("f_or"),
            F.bit_xor("flags").alias("f_xor"),
            BT.bit_display(F.bit_or("flags"), 3).alias("f_or_bits"),
            F.sum(F.when(F.col("flags") >= 4, 1).otherwise(0)).alias("n_highbit"),
        )
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------------
# JSON construction / inspection family (cast_json_func.test:
# JSON_OBJECT / JSON_ARRAY / JSON_LENGTH / JSON_KEYS / JSON_UNQUOTE) —
# Spark to_json over struct/array builds byte-identical compact JSON to
# DuckDB's json_object/to_json (probed: key order, null policy with
# ignoreNullFields=false, no whitespace), so construction is
# hash-comparable text.  All Catalyst builtins, map-only.
@register(
    "func_json_build",
    oracle="""
SELECT c_custkey,
       CAST(json_object('k', c_custkey, 'seg', c_mktsegment) AS VARCHAR) AS obj,
       CAST(json_object('k', c_custkey, 'comment', NULL) AS VARCHAR)     AS obj_with_null,
       CAST(to_json([c_custkey, c_custkey % 7, c_nationkey]) AS VARCHAR) AS arr,
       CAST(json_array_length(to_json([c_custkey, c_custkey % 7, c_nationkey])) AS BIGINT) AS arr_len,
       array_to_string(json_keys(json_object('k', c_custkey, 'seg', c_mktsegment)), ',') AS obj_keys,
       json_extract_string('"' || c_mktsegment || '"', '$') AS unquoted
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
    doc="JSON_OBJECT/JSON_ARRAY/JSON_LENGTH/JSON_KEYS/JSON_UNQUOTE construction family",
)
def func_json_build(spark, sf_dir):
    c = load_tables(spark, sf_dir)["customer"]
    obj = F.to_json(F.struct(c["c_custkey"].alias("k"), c["c_mktsegment"].alias("seg")))
    obj_null = F.to_json(
        F.struct(
            c["c_custkey"].alias("k"),
            F.lit(None).cast("string").alias("comment"),
        ),
        {"ignoreNullFields": "false"},
    )
    arr = F.to_json(F.array(c["c_custkey"], c["c_custkey"] % 7, c["c_nationkey"]))
    return (
        c.filter(c["c_custkey"] <= 300)
        .select(
            "c_custkey",
            obj.alias("obj"),
            obj_null.alias("obj_with_null"),
            arr.alias("arr"),
            F.json_array_length(arr).cast("long").alias("arr_len"),
            F.concat_ws(",", F.json_object_keys(obj)).alias("obj_keys"),
            F.get_json_object(
                F.concat(F.lit('"'), c["c_mktsegment"], F.lit('"')), "$"
            ).alias("unquoted"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# FLOAT/DOUBLE storage semantics (double_float.test; ColumnType::FLOAT vs
# REAL, common_definitions.h:47-76): a FLOAT column stores the IEEE-754
# binary32 rounding of the inserted value; comparisons and arithmetic
# promote to double.  Both engines round to float32 identically, so the
# round-trip error is hash-comparable exactly.
@register(
    "func_double_float",
    oracle="""
SELECT c_custkey,
       CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE)              AS f32_roundtrip,
       CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE) - c_acctbal  AS f32_err,
       (CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE) = c_acctbal) AS exact_in_f32,
       CAST(CAST(c_acctbal AS FLOAT) * CAST(2.0 AS FLOAT) AS DOUBLE) AS f32_product
FROM customer
WHERE c_custkey <= 400
ORDER BY c_custkey
""",
    doc="FLOAT column semantics: binary32 storage rounding, double-promoted compare",
)
def func_double_float(spark, sf_dir):
    c = load_tables(spark, sf_dir)["customer"]
    f32 = c["c_acctbal"].cast("float")
    rt = f32.cast("double")
    return (
        c.filter(c["c_custkey"] <= 400)
        .select(
            "c_custkey",
            rt.alias("f32_roundtrip"),
            (rt - c["c_acctbal"]).alias("f32_err"),
            (rt == c["c_acctbal"]).alias("exact_in_f32"),
            (f32 * F.lit(2.0).cast("float")).cast("double").alias("f32_product"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Extended string family (char_length_function.test, mid_function.test,
# substr_function.test tails): CHAR_LENGTH-vs-byte-LENGTH on multibyte
# text, RPAD/UCASE/LCASE, 2- and 3-arg LOCATE/POSITION, trim variants,
# MySQL INSERT(), EXPORT_SET, MAKE_SET, BIT_LENGTH/OCTET_LENGTH.
# MySQL's LENGTH() is BYTES while CHAR_LENGTH() is characters — the
# multibyte marker column ('é漢' suffix: 1+3 extra chars, 2+3+3 extra
# bytes in UTF-8) pins that distinction on both engines.
@register(
    "func_string_extra",
    oracle="""
SELECT p_partkey,
       p_name || 'é漢' AS mb,
       CAST(length(p_name || 'é漢') AS INT)            AS n_chars,
       CAST(octet_length(encode(p_name || 'é漢')) AS INT) AS n_bytes,
       CAST(8 * octet_length(encode(p_name || 'é漢')) AS INT) AS n_bits,
       rpad(p_brand, 12, '*')                           AS rp,
       upper(p_name)                                    AS uc,
       lower(p_brand)                                   AS lc,
       CAST(strpos(p_name, 'o') AS BIGINT)              AS loc2,
       CAST(CASE WHEN strpos(substr(p_name, 3), 'o') = 0 THEN 0
                 ELSE strpos(substr(p_name, 3), 'o') + 2 END AS BIGINT) AS loc3,
       ltrim('  ' || p_brand)                           AS lt,
       rtrim(p_brand || '  ')                           AS rt,
       CASE WHEN 2 < 1 OR 2 > length(p_name) THEN p_name
            ELSE substr(p_name, 1, 1) || 'XY' || substr(p_name, 2 + 3) END AS ins,
       array_to_string([CASE WHEN (p_partkey & (1 << i)) <> 0
                             THEN 'Y' ELSE 'N' END for i in range(0, 8)], ',') AS eset,
       coalesce(array_to_string(list_filter(
         [CASE WHEN (p_partkey & 1) <> 0 THEN 'a' END,
          CASE WHEN (p_partkey & 2) <> 0 THEN 'b' END,
          CASE WHEN (p_partkey & 4) <> 0 THEN 'c' END],
         x -> x IS NOT NULL), ','), '')                 AS mset
FROM part
WHERE p_partkey <= 100
ORDER BY p_partkey
""",
    doc="extended string family: byte-vs-char length, pads, locate, INSERT/EXPORT_SET/MAKE_SET",
)
def func_string_extra(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t["part"]
    mb = F.concat(p["p_name"], F.lit("é漢"))
    return (
        p.filter(p["p_partkey"] <= 100)
        .select(
            "p_partkey",
            mb.alias("mb"),
            F.char_length(mb).alias("n_chars"),
            F.octet_length(mb).alias("n_bytes"),
            F.bit_length(mb).alias("n_bits"),
            F.rpad(p["p_brand"], 12, "*").alias("rp"),
            F.upper(p["p_name"]).alias("uc"),  # UCASE alias
            F.lower(p["p_brand"]).alias("lc"),  # LCASE alias
            my.locate("o", p["p_name"]).alias("loc2"),
            my.locate("o", p["p_name"], 3).alias("loc3"),
            F.ltrim(F.concat(F.lit("  "), p["p_brand"])).alias("lt"),
            F.rtrim(F.concat(p["p_brand"], F.lit("  "))).alias("rt"),
            my.insert_str(p["p_name"], F.lit(2), F.lit(3), F.lit("XY")).alias("ins"),
            my.export_set(p["p_partkey"], "Y", "N", ",", 8).alias("eset"),
            my.make_set(p["p_partkey"], "a", "b", "c").alias("mset"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# REGEXP family (MySQL 5.7 `expr REGEXP pat` + the 8.0-style
# REGEXP_REPLACE/EXTRACT users expect when migrating).  Patterns are
# restricted to the Java-regex ∩ RE2 ∩ POSIX-class subset (no
# backreferences, no lookaround) so Spark (Java), DuckDB (RE2) and
# MySQL (POSIX/ICU) agree — same portability rule as the PII scrubber.
@register(
    "func_regexp",
    oracle="""
SELECT p_partkey,
       regexp_matches(p_name, '^[a-z]+ ')                        AS starts_word,
       regexp_matches(p_name, '[aeiou]{2}')                      AS double_vowel,
       regexp_replace(p_name, '[aeiou]', '_', 'g')               AS devoweled,
       regexp_extract(p_name, '([a-z]+)$', 1)                    AS last_word,
       CAST(len(regexp_split_to_array(p_name, '\\s+')) AS INT)   AS n_words,
       regexp_matches(p_brand, '[0-9]$')                         AS ends_digit
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
""",
    doc="REGEXP family over the portable Java∩RE2∩POSIX pattern subset",
)
def func_regexp(spark, sf_dir):
    p = load_tables(spark, sf_dir)["part"]
    nm, br = p["p_name"], p["p_brand"]
    return (
        p.filter(p["p_partkey"] <= 200)
        .select(
            "p_partkey",
            nm.rlike("^[a-z]+ ").alias("starts_word"),
            nm.rlike("[aeiou]{2}").alias("double_vowel"),
            F.regexp_replace(nm, "[aeiou]", "_").alias("devoweled"),
            F.regexp_extract(nm, "([a-z]+)$", 1).alias("last_word"),
            F.size(F.split(nm, r"\s+")).alias("n_words"),
            br.rlike("[0-9]$").alias("ends_digit"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# INET_ATON / INET_NTOA (the network-address pair from the MySQL scalar
# library; select_function_calls.test family) — synthesized IPv4s from
# customer keys, converted both directions plus malformed/boundary
# inputs.  Octet arithmetic is integer-exact on both engines; the
# oracle spells the identical math in portable SQL.
@register(
    "func_inet_addresses",
    oracle="""
WITH ips AS (
  SELECT c_custkey,
         CAST(10 + c_custkey % 240 AS VARCHAR) || '.' ||
         CAST(c_custkey % 256 AS VARCHAR) || '.' ||
         CAST((c_custkey * 7) % 256 AS VARCHAR) || '.' ||
         CAST((c_custkey * 13) % 256 AS VARCHAR) AS ip,
         CAST(c_custkey * 65537 % 4294967296 AS BIGINT) AS num
  FROM customer WHERE c_custkey <= 300
)
SELECT c_custkey, ip,
       ((CAST(string_split(ip, '.')[1] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[2] AS BIGINT)) * 256
         + CAST(string_split(ip, '.')[3] AS BIGINT)) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num,
       num,
       CAST(num // 16777216 AS VARCHAR) || '.' ||
       CAST((num // 65536) % 256 AS VARCHAR) || '.' ||
       CAST((num // 256) % 256 AS VARCHAR) || '.' ||
       CAST(num % 256 AS VARCHAR) AS num_ip,
       CAST(NULL AS BIGINT) AS bad_aton
FROM ips
ORDER BY c_custkey
""",
    doc="INET_ATON/INET_NTOA octet math + malformed-input NULL",
)
def func_inet_addresses(spark, sf_dir):
    c = load_tables(spark, sf_dir)["customer"]
    ip = F.concat_ws(
        ".",
        (10 + F.col("c_custkey") % 240).cast("string"),
        (F.col("c_custkey") % 256).cast("string"),
        ((F.col("c_custkey") * 7) % 256).cast("string"),
        ((F.col("c_custkey") * 13) % 256).cast("string"),
    )
    num = (F.col("c_custkey") * 65537 % 4294967296).cast("long")
    return (
        c.filter(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            ip.alias("ip"),
            my.inet_aton(ip).alias("ip_num"),
            num.alias("num"),
            my.inet_ntoa(num).alias("num_ip"),
            my.inet_aton(F.lit("300.1.2.3")).alias("bad_aton"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured type (Spark 4's open-JSON column type — the
# modern engine surface a migrating MySQL-JSON user lands on): a nested
# JSON document built from event columns is parsed once into VARIANT
# and fields are extracted typed.  All leaf values are integers/strings
# so the document text is byte-identical cross-engine; the DuckDB twin
# extracts with its JSON operators.
@register(
    "func_variant_json",
    oracle="""
WITH j AS (
  SELECT event_id,
         '{"id": ' || CAST(event_id AS VARCHAR)
         || ', "tags": [' || CAST(event_id % 5 AS VARCHAR) || ', '
         || CAST(user_id % 7 AS VARCHAR)
         || '], "meta": {"type": "' || event_type || '", "cents": '
         || CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR) || '}}' AS doc
  FROM events WHERE event_id <= 300
)
SELECT event_id,
       CAST(json_extract(doc, '$.id') AS BIGINT)              AS id,
       json_extract_string(doc, '$.meta.type')                AS mtype,
       CAST(json_extract(doc, '$.meta.cents') AS BIGINT)      AS cents,
       CAST(json_extract(doc, '$.tags[0]') AS BIGINT)         AS tag0,
       CAST(json_extract(doc, '$.tags[1]') AS BIGINT)         AS tag1,
       CAST(json_array_length(json_extract(doc, '$.tags')) AS INT) AS n_tags,
       json_extract_string(doc, '$.missing')                  AS absent
FROM j
ORDER BY event_id
""",
    doc="VARIANT parse + typed field extraction over a nested document",
)
def func_variant_json(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    doc = F.concat(
        F.lit('{"id": '),
        F.col("event_id").cast("string"),
        F.lit(', "tags": ['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(", "),
        (F.col("user_id") % 7).cast("string"),
        F.lit('], "meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "cents": '),
        F.round(F.col("value") * 100).cast("long").cast("string"),
        F.lit("}}"),
    )
    v = F.parse_json(doc)
    return (
        e.filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.try_variant_get(v, "$.id", "bigint").alias("id"),
            F.try_variant_get(v, "$.meta.type", "string").alias("mtype"),
            F.try_variant_get(v, "$.meta.cents", "bigint").alias("cents"),
            F.try_variant_get(v, "$.tags[0]", "bigint").alias("tag0"),
            F.try_variant_get(v, "$.tags[1]", "bigint").alias("tag1"),
            F.size(F.try_variant_get(v, "$.tags", "array<variant>")).alias("n_tags"),
            F.try_variant_get(v, "$.missing", "string").alias("absent"),
        )
        .orderBy("event_id")
    )
