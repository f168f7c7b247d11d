"""Round-6 distillations of the reference's issueNNN MTR regression
corpus (mysql-test/suite/tianmu/t/issue*.test) — continuing
queries/regress.py.  Each entry re-creates the bug-shaped semantics
over the driver parquet tables (never the literal INSERT data) so the
DuckDB oracle can arbitrate; the issue file is cited per entry.

Dialect notes that recur below:
* MySQL treats 0/1 ints as booleans inside AND/OR trees; Spark and
  DuckDB need explicit comparisons, so flag columns are compared `= 1`
  (all values are 0/1, so truthiness and equality coincide).
* MySQL's null-safe `<=>` is Spark's `<=>` and DuckDB's
  `IS NOT DISTINCT FROM`.
* Counts use CAST(... AS BIGINT) in the oracle — DuckDB SUM returns
  HUGEINT (pandas float64) and the driver hash is dtype-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stonedb_spark.catalog import load_tables
from stonedb_spark.catalog import sql as run_sql
from stonedb_spark.queries import register

# --------------------------------------------------------------------------
# issue431 / issue467 / issue468 / issue469: constant-folded boolean
# AND/OR trees with literal 0/1 operands, operator precedence (AND
# binds tighter than OR), and the null-safe <=> comparison.  The
# reference's engine mis-evaluated these trees when its syntax
# optimizer rewrote them (issue469 mixes <=> with an AND-over-OR
# precedence trap; issue431 has a dead `OR 0` arm; issue467 chains
# date ranges).
_BOOL_FLAGS = """
  SELECT o_orderkey,
         CAST(o_orderkey % 2 AS INT)  AS e1,
         CAST(o_orderkey % 3 = 0 AS INT) AS e2,
         CAST(o_orderkey % 5 = 0 AS INT) AS e3,
         CAST(o_orderkey % 7 = 0 AS INT) AS e4,
         CAST(o_orderkey % 11 = 0 AS INT) AS e5,
         CAST(o_orderkey % 13 = 0 AS INT) AS e6,
         CAST(o_orderkey % 17 = 0 AS INT) AS e7,
         CAST(o_orderkey % 19 = 0 AS INT) AS e8,
         CAST(o_orderkey % 23 = 0 AS INT) AS e9,
         o_totalprice AS v,
         CASE WHEN o_orderkey % 10 = 0 THEN NULL
              ELSE CAST(o_orderkey % 100 AS INT) END AS nv,
         o_orderdate AS d
  FROM orders WHERE o_orderkey <= 4000
"""

# predicate bodies shared verbatim by both engines ({EQ} = null-safe eq)
_BOOL_PREDS = {
    # issue468: nested AND/OR tree over 0/1 flags
    "n_tree": (
        "(e1=1 AND ((e2=1 AND e3=1 AND (e4=1 OR e5=1)) OR e6=1) "
        "OR (e7=1 AND e8=1 AND e9=1))"
    ),
    # issue468 second arm: one subtree replaced by literal FALSE
    "n_tree_dead_arm": (
        "(e1=1 AND ((e2=1 AND e3=1 AND (e4=1 OR e5=1)) OR 1=0) "
        "OR (e7=1 AND e8=1 AND e9=1))"
    ),
    # issue431: (a >= 3) AND (b = 5 AND a > 2 OR 0) — dead OR-0 arm
    "n_dead_or_zero": "(v >= 30000) AND (e2=1 AND v > 20000 OR 1=0)",
    # issue469: <=> inside AND-over-OR precedence (AND binds tighter)
    "n_nullsafe_prec": (
        "(e1=1) OR ((nv {EQ} 80) OR (e2=1) AND (e3=1)) AND (1=1)"
    ),
    # null-safe vs plain equality on a NULL-bearing column
    "n_nullsafe_null": "nv {EQ} NULL",
    "n_plain_eq_never": "nv = NULL",
    # issue467: date-range OR/AND precedence chain
    "n_date_chain": (
        "(d <= TIMESTAMP '1996-04-05') AND (d >= TIMESTAMP '1999-06-22') "
        "OR (d <= TIMESTAMP '2000-12-13')"
    ),
}


def _bool_battery_sql(eq_op: str) -> str:
    preds = {k: p.format(EQ=eq_op) for k, p in _BOOL_PREDS.items()}
    cols = ",\n  ".join(
        f"CAST(COUNT(CASE WHEN {p} THEN 1 END) AS BIGINT) AS {n}"
        for n, p in preds.items()
    )
    return f"WITH t AS ({_BOOL_FLAGS})\nSELECT\n  {cols}\nFROM t"


@register(
    "regress_bool_const_tree",
    oracle=_bool_battery_sql("IS NOT DISTINCT FROM"),
    doc="issue431/467/468/469: AND/OR trees w/ literal arms, precedence, <=>",
)
def regress_bool_const_tree(spark, sf_dir):
    return run_sql(spark, _bool_battery_sql("<=>"), sf_dir)


# --------------------------------------------------------------------------
# issue433 / issue947: three-valued logic of constant NULL / constant
# value IN and NOT IN against literal NULL lists and subqueries that
# are empty or return NULL.  Every case is a full-table-or-empty count:
# the reference returned rows where SQL 3VL says none (and vice versa).
def _null_in_sql(int_null: str) -> str:
    # int_null: a NULL literal typed as an integer for the engine
    cases = {
        # WHERE NULL IN (NULL) -> NULL -> 0 rows
        "null_in_null": f"{int_null} IN ({int_null})",
        "null_notin_null": f"{int_null} NOT IN ({int_null})",
        # 42 IN (NULL) -> NULL; 42 NOT IN (NULL) -> NULL
        "c_in_null": f"42 IN ({int_null})",
        "c_notin_null": f"42 NOT IN ({int_null})",
        # vs an EMPTY subquery: IN -> FALSE, NOT IN -> TRUE (issue767 core)
        "null_in_empty": f"{int_null} IN (SELECT val FROM t WHERE val > 1000000)",
        "null_notin_empty": f"{int_null} NOT IN (SELECT val FROM t WHERE val > 1000000)",
        "c_in_empty": "42 IN (SELECT val FROM t WHERE val > 1000000)",
        "c_notin_empty": "42 NOT IN (SELECT val FROM t WHERE val > 1000000)",
        # vs a subquery that RETURNS NULLs: membership unknowable
        "c_in_nullsub": f"42 IN (SELECT {int_null} FROM t WHERE val <= 10)",
        "c_notin_nullsub": f"42 NOT IN (SELECT {int_null} FROM t WHERE val <= 10)",
    }
    legs = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS c, CAST((SELECT COUNT(*) FROM t WHERE {p}) AS BIGINT) AS n"
        for n, p in cases.items()
    )
    return (
        "WITH t AS (SELECT o_orderkey AS val FROM orders WHERE o_orderkey <= 50)\n"
        f"{legs}\nORDER BY c"
    )


@register(
    "regress_null_in_const",
    oracle=_null_in_sql("CAST(NULL AS BIGINT)"),
    doc="issue433/947: NULL/constant IN & NOT IN vs NULL lists, empty and NULL subqueries",
)
def regress_null_in_const(spark, sf_dir):
    return run_sql(spark, _null_in_sql("CAST(NULL AS BIGINT)"), sf_dir)


# --------------------------------------------------------------------------
# issue767 / issue669: NOT IN whose subquery is CORRELATED with a theta
# predicate on the outer row.  `val NOT IN (SELECT v2 FROM t2 WHERE
# v2 > t1.val)` must keep every row (membership would need v2 = val AND
# v2 > val — contradiction), while >= / <= variants genuinely filter;
# the reference engine's NOT IN descriptor got these wrong.  issue669
# is the DELETE form of the same shape; surviving-row counts model it.
_THETA_OPS = {"gt": ">", "ge": ">=", "lt": "<", "le": "<="}


def _notin_theta_sql() -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS op, CAST((SELECT COUNT(*) FROM t1 WHERE val NOT IN "
        f"(SELECT v2 FROM t2 WHERE v2 {op} t1.val)) AS BIGINT) AS survivors"
        for n, op in _THETA_OPS.items()
    )
    return f"""
WITH t1 AS (SELECT o_orderkey, CAST(o_orderkey % 50 AS BIGINT) AS val
            FROM orders WHERE o_orderkey <= 300),
     t2 AS (SELECT CAST(o_orderkey % 37 AS BIGINT) AS v2
            FROM orders WHERE o_orderkey <= 300)
{legs}
ORDER BY op
"""


@register(
    "regress_notin_theta_correlated",
    oracle=_notin_theta_sql(),
    doc="issue767/669: correlated theta NOT IN (>, >=, <, <= inner predicates)",
)
def regress_notin_theta_correlated(spark, sf_dir):
    return run_sql(spark, _notin_theta_sql(), sf_dir)


# --------------------------------------------------------------------------
# issue763: `col LIKE NULL` is NULL (never TRUE), including under
# AND/OR with sargable id predicates, NOT LIKE NULL, and UNION ALL legs
# — the reference returned rows for some of these.
def _like_null_sql() -> str:
    cases = {
        "like_null": "name LIKE NULL",
        "notlike_null": "name NOT LIKE NULL",
        "and_like_null": "id = 1 AND name LIKE NULL",
        "or_like_null": "id = 1 OR name LIKE NULL",
        "in_and_like_null": "id IN (4, 5) AND name LIKE NULL",
        "in_or_like_null": "id IN (4, 5) OR name LIKE NULL",
        "like_empty": "name LIKE ''",
        "is_null": "name IS NULL",
    }
    legs = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS c, CAST((SELECT COUNT(*) FROM t WHERE {p}) AS BIGINT) AS n"
        for n, p in cases.items()
    )
    return (
        "WITH t AS (SELECT c_custkey AS id,\n"
        "                  CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_name END AS name\n"
        "           FROM customer WHERE c_custkey <= 200)\n"
        f"{legs}\nORDER BY c"
    )


@register(
    "regress_like_null",
    oracle=_like_null_sql(),
    doc="issue763: LIKE NULL / NOT LIKE NULL under AND/OR/IN combinations",
)
def regress_like_null(spark, sf_dir):
    return run_sql(spark, _like_null_sql(), sf_dir)


# --------------------------------------------------------------------------
# issue282: OR-of-equijoin conditions over a table pair — the mixed
# AND/OR nesting grid from the issue, evaluated as counts over the
# bounded supplier x nation cross product (40 x 25 rows; the shape is
# the point, the cross stays broadcast-sized at any SF because both
# inputs are key-capped).
_JOIN_OR_PREDS = {
    "c_eq_and_or": "s_suppkey = 20 AND (s_suppkey = n_nationkey OR s_nationkey = n_nationkey)",
    "c_eq_or_or": "s_suppkey = 20 OR (s_suppkey = n_nationkey OR s_nationkey = n_nationkey)",
    "c_eq_and_and": "s_suppkey = 20 AND (s_suppkey = n_nationkey AND s_nationkey = n_nationkey)",
    "c_or_precedence": "s_suppkey = 20 OR s_suppkey = n_nationkey AND s_nationkey = n_nationkey",
    "c_range_or_eq": "(s_suppkey > 20 OR s_suppkey = n_nationkey) AND s_nationkey = n_nationkey",
    "c_range_and_theta": "(s_suppkey <= 20 AND s_suppkey > n_nationkey) OR s_nationkey = n_nationkey",
    # issue282 "multiple nesting" arm
    "c_nested": (
        "n_nationkey = 6 OR (s_suppkey = 20 AND "
        "(s_suppkey = n_nationkey OR s_nationkey = n_nationkey))"
    ),
}


def _join_or_sql() -> str:
    cols = ",\n  ".join(
        f"CAST(COUNT(CASE WHEN {p} THEN 1 END) AS BIGINT) AS {n}"
        for n, p in _JOIN_OR_PREDS.items()
    )
    return f"""
WITH s AS (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_suppkey <= 40),
     n AS (SELECT n_nationkey FROM nation)
SELECT
  {cols}
FROM s CROSS JOIN n
"""


@register(
    "regress_join_or_conditions",
    oracle=_join_or_sql(),
    doc="issue282: OR-of-equijoin predicate grid over a bounded table pair",
)
def regress_join_or_conditions(spark, sf_dir):
    return run_sql(spark, _join_or_sql(), sf_dir)


# --------------------------------------------------------------------------
# issue270: SELECT DISTINCT over a multi-table join whose condition is
# an OR of equalities across different table pairs, then ORDER BY +
# LIMIT — the reference's EXPLAIN row estimate bug came from this
# shape; here the RESULT is pinned (deterministic order, full tiebreak).
_DISTINCT_OR_SQL = """
SELECT DISTINCT n.n_nationkey AS nationkey, n.n_name AS name
FROM supplier s, region r, nation n
WHERE (s.s_nationkey = n.n_nationkey
       OR (s.s_nationkey = r.r_regionkey AND n.n_regionkey = r.r_regionkey))
  AND s.s_suppkey <= 30
ORDER BY nationkey
LIMIT 5
"""


@register(
    "regress_distinct_or_join_topk",
    oracle=_DISTINCT_OR_SQL,
    doc="issue270: DISTINCT over OR-joined 3-table product + ORDER BY/LIMIT",
)
def regress_distinct_or_join_topk(spark, sf_dir):
    return run_sql(spark, _DISTINCT_OR_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue845 / issue464: EXTRACT with MySQL composite units (DAY_HOUR,
# MINUTE_SECOND, YEAR_MONTH, DAY_MINUTE, HOUR_SECOND, DAY_SECOND) —
# fields packed positionally in decimal.  Neither Spark nor DuckDB has
# composite units; the shim packs scalar extracts, the oracle spells
# the same arithmetic.
@register(
    "regress_extract_composite",
    oracle="""
SELECT event_id,
       CAST(EXTRACT(year FROM ts) * 100 + EXTRACT(month FROM ts) AS BIGINT) AS ym,
       CAST(EXTRACT(day FROM ts) * 100 + EXTRACT(hour FROM ts) AS BIGINT) AS dh,
       CAST(EXTRACT(day FROM ts) * 10000 + EXTRACT(hour FROM ts) * 100
            + EXTRACT(minute FROM ts) AS BIGINT) AS dmi,
       CAST(EXTRACT(day FROM ts) * 1000000 + EXTRACT(hour FROM ts) * 10000
            + EXTRACT(minute FROM ts) * 100 + EXTRACT(second FROM ts) AS BIGINT) AS ds,
       CAST(EXTRACT(hour FROM ts) * 10000 + EXTRACT(minute FROM ts) * 100
            + EXTRACT(second FROM ts) AS BIGINT) AS hs,
       CAST(EXTRACT(minute FROM ts) * 100 + EXTRACT(second FROM ts) AS BIGINT) AS mis
FROM events
WHERE event_id <= 150
ORDER BY event_id
""",
    doc="issue845/464: EXTRACT composite units (DAY_HOUR, MINUTE_SECOND, ...)",
)
def regress_extract_composite(spark, sf_dir):
    from stonedb_spark.functions import mysql as my

    e = load_tables(spark, sf_dir)["events"]
    ts = e["ts"]
    return (
        e.filter(e["event_id"] <= 150)
        .select(
            "event_id",
            my.extract_composite(ts, "YEAR_MONTH").alias("ym"),
            my.extract_composite(ts, "DAY_HOUR").alias("dh"),
            my.extract_composite(ts, "DAY_MINUTE").alias("dmi"),
            my.extract_composite(ts, "DAY_SECOND").alias("ds"),
            my.extract_composite(ts, "HOUR_SECOND").alias("hs"),
            my.extract_composite(ts, "MINUTE_SECOND").alias("mis"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# issue1173: temporal values in NUMERIC context — MySQL evaluates a
# DATETIME as the packed number YYYYMMDDHHMMSS (TIME as HHMMSS) when a
# bit/arithmetic operator touches it: a & a, a | a, a ^ 0, a << 1,
# a >> 1, bit_count(a).  Both engines compute on the same packed BIGINT.
@register(
    "regress_temporal_numeric_context",
    oracle="""
SELECT event_id,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS dtnum,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT)
         & CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS b_and,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT)
         | CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS b_or,
       xor(CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT), 0) AS b_xor0,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) << 1 AS b_shl,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) >> 1 AS b_shr,
       CAST(bit_count(CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT)) AS BIGINT) AS b_cnt,
       CAST(strftime(ts, '%H%M%S') AS BIGINT) AS tnum
FROM events
WHERE event_id <= 150
ORDER BY event_id
""",
    doc="issue1173: DATETIME/TIME in numeric context (packed digits) + bit ops",
)
def regress_temporal_numeric_context(spark, sf_dir):
    e = load_tables(spark, sf_dir)["events"]
    dtnum = F.date_format(e["ts"], "yyyyMMddHHmmss").cast("long")
    tnum = F.date_format(e["ts"], "HHmmss").cast("long")
    return (
        e.filter(e["event_id"] <= 150)
        .select(
            "event_id",
            dtnum.alias("dtnum"),
            dtnum.bitwiseAND(dtnum).alias("b_and"),
            dtnum.bitwiseOR(dtnum).alias("b_or"),
            dtnum.bitwiseXOR(F.lit(0)).alias("b_xor0"),
            F.shiftleft(dtnum, 1).alias("b_shl"),
            F.shiftright(dtnum, 1).alias("b_shr"),
            F.bit_count(dtnum).cast("long").alias("b_cnt"),
            tnum.alias("tnum"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# issue975: STR_TO_DATE with TIME-only formats (%H:%i:%s, %T,
# %h:%i:%s%p, %r) — MySQL returns a TIME; modeled as the canonical
# 'HH:mm:ss' string on both engines, NULL where the text does not parse
# under the format (the AM/PM form fed a 24-hour string, for example).
@register(
    "regress_str_to_date_time",
    oracle="""
WITH t AS (
  SELECT event_id,
         lpad(CAST(EXTRACT(hour FROM ts) AS VARCHAR), 2, '0') || ':' ||
         lpad(CAST(EXTRACT(minute FROM ts) AS VARCHAR), 2, '0') || ':' ||
         lpad(CAST(EXTRACT(second FROM ts) AS VARCHAR), 2, '0') AS t24,
         lpad(CAST(CASE WHEN EXTRACT(hour FROM ts) % 12 = 0 THEN 12
                        ELSE EXTRACT(hour FROM ts) % 12 END AS VARCHAR), 2, '0')
           || ':' ||
         lpad(CAST(EXTRACT(minute FROM ts) AS VARCHAR), 2, '0') || ':' ||
         lpad(CAST(EXTRACT(second FROM ts) AS VARCHAR), 2, '0') ||
         CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 'AM' ELSE 'PM' END AS t12
  FROM events WHERE event_id <= 150
)
SELECT event_id,
       strftime(strptime(t24, '%H:%M:%S'), '%H:%M:%S')      AS from_hms,
       strftime(strptime(t24, '%H:%M:%S'), '%H:%M:%S')      AS from_t,
       strftime(strptime(t12, '%I:%M:%S%p'), '%H:%M:%S')    AS from_ampm,
       strftime(strptime(t12, '%I:%M:%S%p'), '%H:%M:%S')    AS from_r_strict,
       strftime(try_strptime(t24, '%I:%M:%S%p'), '%H:%M:%S') AS mismatch_null
FROM t
ORDER BY event_id
""",
    doc="issue975: STR_TO_DATE time-only formats incl. %p AM/PM; NULL on mismatch",
)
def regress_str_to_date_time(spark, sf_dir):
    from stonedb_spark.functions import mysql as my

    e = load_tables(spark, sf_dir)["events"]
    t24 = F.date_format(e["ts"], "HH:mm:ss")
    t12 = F.date_format(e["ts"], "hh:mm:ssa")
    return (
        e.filter(e["event_id"] <= 150)
        .select(
            "event_id",
            my.str_to_date_time(t24, "%H:%i:%s").alias("from_hms"),
            my.str_to_date_time(t24, "%T").alias("from_t"),
            my.str_to_date_time(t12, "%h:%i:%s%p").alias("from_ampm"),
            my.str_to_date_time(t12, "%h:%i:%s%p").alias("from_r_strict"),
            my.str_to_date_time(t24, "%h:%i:%s%p").alias("mismatch_null"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# issue415: GROUP BY on SELECT aliases (constant alias, negated-flag
# alias, literal alias) with ASC markers, HAVING on an aggregate's
# alias, and MIN over a boolean expression (MySQL `!x` -> 0/1 int).
# All three engines resolve the aliases; the 0/1 int modeling pins the
# MySQL numeric-boolean surface.
_ALIAS_HAVING_SQL = """
SELECT 'aa' AS ag1,
       CAST(NOT (o_orderkey % 2 = 0) AS INT) AS ag2,
       1 AS ag3,
       CAST(MIN(CAST(o_orderkey % 97 + o_orderkey % 11 = 11 AS INT)) AS INT)
         AS ag_fun
FROM orders
WHERE o_orderkey <= 2000
GROUP BY ag1, ag2, ag3
HAVING ag_fun <= 37
ORDER BY ag1, ag2 ASC, ag3 ASC, ag_fun
"""


@register(
    "regress_alias_group_having_battery",
    oracle=_ALIAS_HAVING_SQL,
    doc="issue415: GROUP BY aliases + ASC, HAVING aggregate alias, MIN(bool)",
)
def regress_alias_group_having_battery(spark, sf_dir):
    return run_sql(spark, _ALIAS_HAVING_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue906: outer column IN / NOT IN an AGGREGATE subquery
# (article IN (SELECT COUNT(*) ... GROUP BY ...)) — int key against
# BIGINT counts, the implicit-widening compare the reference fumbled.
_IN_AGG_SQL = """
WITH counts AS (SELECT COUNT(*) AS c FROM lineitem
                WHERE l_orderkey <= 2000 GROUP BY l_suppkey)
SELECT
  CAST((SELECT COUNT(*) FROM part WHERE p_partkey <= 200
        AND p_partkey IN (SELECT c FROM counts)) AS BIGINT) AS n_in,
  CAST((SELECT COUNT(*) FROM part WHERE p_partkey <= 200
        AND p_partkey NOT IN (SELECT c FROM counts)) AS BIGINT) AS n_notin,
  CAST((SELECT COUNT(*) FROM part WHERE p_partkey <= 200
        AND p_size IN (SELECT COUNT(*) FROM lineitem WHERE l_orderkey <= 2000
                       GROUP BY l_returnflag)) AS BIGINT) AS n_size_in
"""


@register(
    "regress_in_agg_subquery",
    oracle=_IN_AGG_SQL,
    doc="issue906: key IN / NOT IN (SELECT COUNT(*) ... GROUP BY) widening",
)
def regress_in_agg_subquery(spark, sf_dir):
    return run_sql(spark, _IN_AGG_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1258: a derived table whose AGGREGATE alias SHADOWS a source
# column name (COUNT(a.first_name) AS first_name), grouped by an
# expression, consumed by the outer select — alias resolution must bind
# the outer reference to the derived output, not the base column.
_ALIAS_SHADOW_SQL = """
SELECT bb.c_name, bb.seg
FROM (
  SELECT CAST(COUNT(a.c_name) AS BIGINT) AS c_name,
         SUBSTRING(a.c_mktsegment, 1, 4) AS seg
  FROM customer a, customer b
  WHERE a.c_custkey = b.c_custkey AND a.c_custkey <= 500
  GROUP BY SUBSTRING(a.c_mktsegment, 1, 4)
) bb
ORDER BY bb.seg
"""


@register(
    "regress_derived_alias_shadow",
    oracle=_ALIAS_SHADOW_SQL,
    doc="issue1258: aggregate alias shadowing a column, self-join + derived table",
)
def regress_derived_alias_shadow(spark, sf_dir):
    return run_sql(spark, _ALIAS_SHADOW_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue938: GROUP_CONCAT over a DECIMAL column, with ORDER BY, both
# directly and through a derived table — decimal-to-string formatting
# inside the concat is the regression surface (DECIMAL(17,0) renders
# without a fraction).  Spark side uses sorted collect_list (the
# repo's group_concat modeling), DuckDB string_agg with ORDER BY.
@register(
    "regress_group_concat_decimal",
    oracle="""
WITH d AS (SELECT l_returnflag,
                  CAST(CAST(round(l_extendedprice) AS BIGINT) AS DECIMAL(17,0)) AS d1
           FROM lineitem WHERE l_orderkey <= 200)
SELECT l_returnflag,
       string_agg(CAST(d1 AS VARCHAR), ',' ORDER BY d1, CAST(d1 AS VARCHAR)) AS cat,
       string_agg(CAST(d1 AS VARCHAR), ',' ORDER BY d1 DESC, CAST(d1 AS VARCHAR) DESC)
         AS cat_desc
FROM (SELECT * FROM d) a1
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="issue938: GROUP_CONCAT(decimal ORDER BY ...) through a derived table",
)
def regress_group_concat_decimal(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]  # noqa: E741
    d1 = F.round(l["l_extendedprice"]).cast("long").cast("decimal(17,0)")
    base = l.filter(l["l_orderkey"] <= 200).select(
        "l_returnflag", d1.alias("d1")
    )
    asc = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.col("d1"))),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    desc = F.array_join(
        F.reverse(
            F.transform(
                F.array_sort(F.collect_list(F.col("d1"))),
                lambda x: x.cast("string"),
            )
        ),
        ",",
    )
    return (
        base.groupBy("l_returnflag")
        .agg(asc.alias("cat"), desc.alias("cat_desc"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# issue1385: NULL propagation through CONCAT vs IFNULL inside a derived
# table consumed by an outer LIKE — CONCAT(name, '') keeps NULL rows
# out (NULL LIKE anything is NULL), CONCAT(IFNULL(name,'')) keeps them
# as empty strings; counting both pins the difference.
_IFNULL_CONCAT_SQL = """
WITH t AS (SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS name
           FROM customer WHERE c_custkey <= 500)
SELECT
  CAST((SELECT COUNT(*) FROM (SELECT CONCAT(COALESCE(name, '')) AS c1 FROM t) x
        WHERE x.c1 NOT LIKE '%#000000001%') AS BIGINT) AS n_ifnull_notlike,
  CAST((SELECT COUNT(*) FROM (SELECT COALESCE(name, '') AS c1 FROM t) x
        WHERE x.c1 LIKE '%1%') AS BIGINT) AS n_ifnull_like,
  CAST((SELECT COUNT(*) FROM (SELECT CONCAT(name, '') AS c1 FROM t) x
        WHERE x.c1 LIKE '%1%') AS BIGINT) AS n_concat_like,
  CAST((SELECT COUNT(*) FROM (SELECT CONCAT(name, '') AS c1 FROM t) x
        WHERE x.c1 NOT LIKE '%1%') AS BIGINT) AS n_concat_notlike,
  CAST((SELECT COUNT(*) FROM (SELECT CONCAT(name, '') AS c1 FROM t) x
        WHERE x.c1 IS NULL) AS BIGINT) AS n_concat_null
"""


@register(
    "regress_ifnull_concat_like",
    # DuckDB's CONCAT skips NULL arguments (CONCAT_WS-style); MySQL and
    # Spark propagate NULL.  The oracle therefore spells the MySQL
    # semantics with || (NULL-propagating in DuckDB).
    oracle=_IFNULL_CONCAT_SQL.replace("CONCAT(name, '')", "(name || '')"),
    doc="issue1385: CONCAT/IFNULL NULL propagation under derived-table LIKE",
)
def regress_ifnull_concat_like(spark, sf_dir):
    return run_sql(spark, _IFNULL_CONCAT_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue962: LEFT theta-join (>=) where the WHERE clause tests
# CONCAT_WS with a COLUMN separator for NULL — a NULL separator nulls
# the whole concat (unlike NULL arguments, which CONCAT_WS skips), so
# the filter keeps exactly the rows whose left key is NULL plus the
# unmatched-right rows whose payload column went NULL.
_THETA_CONCAT_SQL = """
WITH a AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                       ELSE CAST(n_nationkey AS {STR}) END AS c0,
                  n_nationkey AS k
           FROM nation),
     b AS (SELECT CAST(n_nationkey AS {STR}) AS c0, n_nationkey AS k
           FROM nation WHERE n_nationkey >= 20)
SELECT a.k AS a_k, b.k AS b_k
FROM a LEFT JOIN b ON a.k >= b.k
WHERE CONCAT_WS(a.c0, b.c0, 'x') IS NULL
ORDER BY a_k, b_k
"""


@register(
    "regress_left_theta_concat_null",
    oracle=_THETA_CONCAT_SQL.format(STR="VARCHAR"),
    doc="issue962: LEFT >= join + CONCAT_WS(column separator) NULL filter",
)
def regress_left_theta_concat_null(spark, sf_dir):
    # Spark's parser wants STRING (bare VARCHAR needs a length)
    return run_sql(spark, _THETA_CONCAT_SQL.format(STR="STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue880 / issue998 / issue226: UNION type ladder — timestamp with
# varchar, int with char — MySQL's common type is the STRING form.
# Spark 4's ANSI union would coerce the string branch of int UNION
# varchar to BIGINT (and fault on non-numeric text), so the MySQL rule
# is spelled as explicit CASTs on BOTH engines; the regression pins the
# rendered forms ('1995-01-02 00:00:00', plain digits) as equal.
_UNION_LADDER_SQL = """
SELECT v FROM (
  SELECT CAST(o_orderdate AS VARCHAR) AS v FROM orders WHERE o_orderkey <= 40
  UNION
  SELECT o_orderpriority AS v FROM orders WHERE o_orderkey <= 40
  UNION
  SELECT CAST(o_orderkey AS VARCHAR) AS v FROM orders WHERE o_orderkey <= 40
) u
ORDER BY v
"""


@register(
    "regress_union_type_ladder",
    oracle=_UNION_LADDER_SQL.replace("AS VARCHAR", "AS VARCHAR"),
    doc="issue880/998/226: timestamp/int/varchar UNION via MySQL string common type",
)
def regress_union_type_ladder(spark, sf_dir):
    return run_sql(spark, _UNION_LADDER_SQL.replace("AS VARCHAR", "AS STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue1054 / issue222 / issue362: identifiers that are MySQL keywords
# (`select`, `update`, `join`, ...), contain $ signs, or non-ASCII
# letters — quoted projection + aggregation over them must resolve.
_KEYWORD_IDENT_SQL = """
SELECT t.`select`, CAST(COUNT(*) AS BIGINT) AS `count`,
       CAST(SUM(t.`a$1`) AS BIGINT) AS `$sum`, MAX(t.`abc_def`) AS `abc_def`
FROM (
  SELECT n_regionkey AS `select`, n_nationkey AS `a$1`, n_name AS `abc_def`
  FROM nation
) t
GROUP BY t.`select`
ORDER BY t.`select`
"""


@register(
    "regress_keyword_identifiers",
    oracle=_KEYWORD_IDENT_SQL.replace("`", '"'),
    doc="issue1054/222/362: keyword / $-sign / unicode identifiers, quoted",
)
def regress_keyword_identifiers(spark, sf_dir):
    return run_sql(spark, _KEYWORD_IDENT_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue301: constant predicates inside OR/AND chains — numeric literal
# compares (1 > 1.1), string-vs-string ('a' <= 'a'), string-vs-number
# (MySQL coerces '1.1' to 1.1, so 1 > '1.1' is FALSE), column-vs-column
# and IS NULL arms.  The reference's filter tree mishandled the folded
# constant arms; counts pin every variant.  The string-number compare
# is spelled CAST('1.1' AS DOUBLE) on both engines (MySQL's implicit
# coercion rule, made explicit because Spark ANSI would reject the
# implicit form).
_CONST_PREDS = {
    "n_true_and_or": "(1=1 AND 1=1) OR b > 200",
    "n_or_false": "b > 200 OR 1=2",
    "n_or_true": "b > 200 OR 1<2",
    "n_num_coerce": "(1 > CAST('1.1' AS DOUBLE)) OR b > 200",
    "n_dec_cmp": "(1.2 >= 1.2) OR b > 200",
    "n_str_cmp": "('a' <= 'a') OR b > 200",
    "n_col_eq": "(a = b) OR b > 200",
    "n_col_ne": "(a != b) OR b > 200",
    "n_isnull_col": "(a IS NULL) OR b > 200",
    "n_isnull_lit": "(NULL IS NULL) OR b > 200",
    "n_and_false_arm": "(1=1 AND 1!=1) OR b > 200",
    "n_and_gate": "(1=1 AND 1=1) AND b > 200",
}


def _const_pred_sql() -> str:
    cols = ",\n  ".join(
        f"CAST(COUNT(CASE WHEN {p} THEN 1 END) AS BIGINT) AS {n}"
        for n, p in _CONST_PREDS.items()
    )
    return f"""
WITH t AS (
  SELECT CAST(o_orderkey % 7 AS BIGINT) AS a,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL
              ELSE CAST(o_orderkey % 250 AS BIGINT) END AS b
  FROM orders WHERE o_orderkey <= 3000
)
SELECT
  {cols}
FROM t
"""


@register(
    "regress_const_predicate_or",
    oracle=_const_pred_sql(),
    doc="issue301: constant-arm OR/AND predicate battery incl. string-number coercion",
)
def regress_const_predicate_or(spark, sf_dir):
    return run_sql(spark, _const_pred_sql(), sf_dir)


# --------------------------------------------------------------------------
# issue446: XOR between predicates in a join condition over a derived
# table (A.val > 1 XOR tt.val > 2).  Spark has no XOR keyword and
# DuckDB's xor() is bitwise, so both engines spell the logical XOR as
# boolean inequality — which is exactly MySQL's truth table for
# non-NULL operands.
_XOR_JOIN_SQL = """
WITH a AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation),
     b AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation)
SELECT CAST(COUNT(*) AS BIGINT) AS n_xor_pairs,
       CAST(COUNT(CASE WHEN (a.r > 1) <> (b.r > 2) THEN 1 END) AS BIGINT)
         AS n_xor_true
FROM a JOIN b ON (a.k < b.k)
"""


@register(
    "regress_xor_join_condition",
    oracle=_XOR_JOIN_SQL,
    doc="issue446: logical XOR of predicates across a join (as boolean <>)",
)
def regress_xor_join_condition(spark, sf_dir):
    return run_sql(spark, _XOR_JOIN_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1897 / issue1903: the MySQL user-variable idioms
# @row := @row + 1 (row numbering), @rankno with @pxydm group-change
# tracking (per-group rank), @prev_value group-id assignment — all
# order-dependent session state.  The Spark-era translation is window
# functions, which is what a reference user migrating these queries
# writes; this entry pins the exact translation over the orders table:
#   inde    = ROW_NUMBER() OVER (ORDER BY ...)
#   rankno  = ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY ...)
#   group_id = DENSE_RANK() OVER (ORDER BY custkey)
_USER_VAR_SQL = """
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS inde,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS rankno,
       CAST(DENSE_RANK() OVER (ORDER BY o_custkey) AS BIGINT) AS group_id
FROM orders
WHERE o_orderkey <= 500
ORDER BY o_custkey, inde
"""


@register(
    "regress_user_var_rownum",
    oracle=_USER_VAR_SQL,
    doc="issue1897/1903: @row/@rankno/@prev user-variable idioms as window functions",
)
def regress_user_var_rownum(spark, sf_dir):
    return run_sql(spark, _USER_VAR_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1910: joins whose ON clause is a bare NON-BOOLEAN expression
# (ON t2.price, ON created_date) — MySQL truthiness: non-zero/non-NULL
# is true.  Both engines spell the rule explicitly (<> 0 /
# IS NOT NULL), plus the 1-row constant derived table join arms from
# the issue (broadcast on any cluster).
_TRUTHY_JOIN_SQL = """
WITH one AS (SELECT 456.234 AS x),
     t2 AS (SELECT n_nationkey AS id, n_name AS name,
                   CAST(n_regionkey AS DECIMAL(10,2)) AS price
            FROM nation)
SELECT
  CAST((SELECT COUNT(*) FROM t2 JOIN one ON one.x <> 0) AS BIGINT)
    AS n_const_on,
  CAST((SELECT COUNT(*) FROM t2 JOIN one ON t2.price <> 0) AS BIGINT)
    AS n_truthy_price,
  CAST((SELECT COUNT(*) FROM one LEFT JOIN t2 ON t2.price <> 0) AS BIGINT)
    AS n_left_truthy,
  CAST((SELECT COUNT(*) FROM t2 a CROSS JOIN one b) AS BIGINT)
    AS n_cross_one
"""


@register(
    "regress_join_on_truthy",
    oracle=_TRUTHY_JOIN_SQL,
    doc="issue1910: ON <non-boolean expr> truthiness + 1-row constant joins",
)
def regress_join_on_truthy(spark, sf_dir):
    return run_sql(spark, _TRUTHY_JOIN_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1942: boolean postfix tests — (col IS NULL) IS TRUE summed, and
# CAST(boolean AS integer) summed (MySQL CAST(... AS UNSIGNED)).  The
# reference returned the wrong sums; shared text runs on both engines.
_IS_TRUE_SQL = """
WITH t AS (SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL
                       ELSE o_orderkey END AS c0
           FROM orders WHERE o_orderkey <= 1000)
SELECT
  CAST(SUM(CASE WHEN (c0 IS NULL) IS TRUE THEN 1 ELSE 0 END) AS BIGINT)
    AS sum_is_true,
  CAST(SUM(CAST((c0 IS NULL) AS INT)) AS BIGINT) AS sum_cast_bool,
  CAST(SUM(CASE WHEN (c0 IS NULL) IS NOT TRUE THEN 1 ELSE 0 END) AS BIGINT)
    AS sum_not_true
FROM t
"""


@register(
    "regress_bool_is_true_sum",
    oracle=_IS_TRUE_SQL,
    doc="issue1942: (x IS NULL) IS TRUE / CAST(bool AS INT) aggregation",
)
def regress_bool_is_true_sum(spark, sf_dir):
    return run_sql(spark, _IS_TRUE_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1861 / issue1912 / issue1931: the financial-schema shape — every
# key a DECIMAL(18,0), multi-hop equijoins on those decimal keys with
# constant label columns.  Decimal keys must hash/compare exactly
# across the join chain (a double detour would corrupt keys over 2^53).
# Final outputs are cast BIGINT/DOUBLE on both sides — the decimal-ness
# under test is the JOIN KEYS, and DuckDB's pandas bridge materializes
# wide decimals as float64, which the dtype-exact driver hash rejects.
_DECIMAL_KEYS_SQL = """
WITH pool AS (SELECT CAST(n_nationkey AS DECIMAL(18,0)) AS row_id FROM nation),
     node AS (SELECT CAST(n_nationkey AS DECIMAL(18,0)) AS row_id,
                     CAST(n_regionkey AS DECIMAL(18,0)) AS pool_id
              FROM nation),
     acct AS (SELECT CAST(s_suppkey AS DECIMAL(18,0)) AS row_id,
                     CAST(s_nationkey AS DECIMAL(18,0)) AS node_id,
                     CAST(s_acctbal AS DECIMAL(16,2)) AS amount
              FROM supplier WHERE s_suppkey <= 200)
SELECT CAST(p.row_id AS BIGINT) AS pool_id,
       CAST(COUNT(*) AS BIGINT) AS n_acct,
       CAST(CAST(SUM(a.amount) AS DECIMAL(38,2)) AS DOUBLE) AS total_amount
FROM pool p
JOIN node n ON n.pool_id = p.row_id
JOIN acct a ON a.node_id = n.row_id
GROUP BY p.row_id
ORDER BY pool_id
"""


@register(
    "regress_decimal_join_keys",
    oracle=_DECIMAL_KEYS_SQL,
    doc="issue1861/1912/1931: DECIMAL(18,0) key chains through multi-hop joins",
)
def regress_decimal_join_keys(spark, sf_dir):
    return run_sql(spark, _DECIMAL_KEYS_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue850 / issue852: the Star-Schema-Benchmark table shape — a
# denormalized lineorder built by joining the fact to every dimension,
# then an SSB-Q1-style flight over the flat table.  At 100 TB the flat
# CTAS is the classic read-optimization trade (one wide scan, zero
# join shuffles per query); the entry pins that the denormalized
# rollup equals the normalized join result by computing it from the
# flat derived table.
_SSB_FLAT_SQL = """
WITH lineorder_flat AS (
  SELECT l.l_orderkey AS lo_orderkey,
         l.l_quantity AS lo_quantity,
         l.l_extendedprice AS lo_extendedprice,
         l.l_discount AS lo_discount,
         o.o_orderdate AS lo_orderdate,
         c.c_mktsegment AS c_mktsegment,
         s.s_nationkey AS s_nationkey,
         p.p_brand AS p_brand
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT CAST(EXTRACT(year FROM lo_orderdate) AS INT) AS order_year,
       c_mktsegment,
       CAST(SUM(CAST(round(lo_extendedprice * lo_discount * 100)
                     AS DECIMAL(38,0))) AS DOUBLE) / 100 AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineorder_flat
WHERE lo_quantity < 25 AND lo_discount BETWEEN 0.02 AND 0.08
GROUP BY order_year, c_mktsegment
ORDER BY order_year, c_mktsegment
"""


@register(
    "regress_ssb_flat_rollup",
    oracle=_SSB_FLAT_SQL,
    doc="issue850/852: denormalized SSB lineorder_flat + Q1-style revenue flight",
)
def regress_ssb_flat_rollup(spark, sf_dir):
    return run_sql(spark, _SSB_FLAT_SQL, sf_dir)


# --------------------------------------------------------------------------
# Single-function MTR files with no prior named cross-reference
# (coalesce_ascii_func.test, dayofyear_function.test,
# AddTime_function.test): COALESCE ladders over mixed/NULL args, ASCII
# of digits/letters/symbols, DAYOFYEAR on dates and datetimes, and
# ADDTIME with MySQL "D H:MM:SS" / "HHH:MM:SS" / negative TIME-string
# intervals.  The TIME-string intervals are constants, so both engines
# receive them pre-parsed to seconds (the parse itself is pinned by the
# expected-value columns).
def _addtime_secs(spec: str) -> int:
    s = spec.strip()
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("+-")
    days = 0
    if " " in s:
        d, s = s.split(" ", 1)
        days = int(d)
    parts = [int(p) for p in s.split(":")]
    while len(parts) < 3:
        parts.append(0)
    h, m, sec = parts
    return sign * (days * 86400 + h * 3600 + m * 60 + sec)


_ADDTIME_SPECS = {
    "plus_d_hms": "2 1:1:1",
    "minus_hms": "-2:2:2",
    "hours_over_24": "100:11:12",
    "neg_hours_over_24": "-100:11:12",
    "bare_hours_mins": "100:11",
}


def _single_func_sql() -> str:
    add_cols = ",\n  ".join(
        f"ts + ({_addtime_secs(spec)}) * INTERVAL 1 SECOND AS at_{name}"
        for name, spec in _ADDTIME_SPECS.items()
    )
    return f"""
WITH t AS (
  SELECT event_id, ts,
         CASE WHEN event_id % 5 = 0 THEN NULL
              ELSE CAST(event_id AS {{STR}}) END AS a
  FROM events WHERE event_id <= 120
)
SELECT event_id,
  COALESCE(NULL, NULL, 'stonedb', NULL, 'tianmu') AS coalesce_const,
  COALESCE(a, 'na') AS coalesce_col,
  CAST(ASCII(COALESCE(a, '~')) AS BIGINT) AS ascii_first,
  CAST(ASCII('A') AS BIGINT) AS ascii_upper,
  CAST(EXTRACT(DOY FROM ts) AS BIGINT) AS doy,
  {add_cols}
FROM t
ORDER BY event_id
"""


@register(
    "regress_single_func_pins",
    oracle=_single_func_sql().format(STR="VARCHAR"),
    doc="coalesce_ascii_func/dayofyear_function/AddTime_function MTR pins",
)
def regress_single_func_pins(spark, sf_dir):
    return run_sql(spark, _single_func_sql().format(STR="STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue405 / issue417 / issue429 / issue995: the TIME type — range
# compares ('val >= 08:02:45'), BETWEEN projected as a boolean, and
# CONVERT(datetime, TIME).  Spark has no TIME type; the model is the
# canonical zero-padded 'HH:mm:ss' string, whose lexicographic order
# equals TIME order — each comparison is therefore a plain string
# compare on both engines.
_TIME_TYPE_SQL = """
WITH t AS (
  SELECT event_id, {TOD} AS tod FROM events WHERE event_id <= 400
)
SELECT
  CAST(COUNT(CASE WHEN tod >= '08:02:45' THEN 1 END) AS BIGINT) AS n_ge,
  CAST(COUNT(CASE WHEN tod BETWEEN '12:00:00' AND '12:30:00' THEN 1 END)
    AS BIGINT) AS n_between,
  CAST(SUM(CASE WHEN tod NOT BETWEEN '10:00:00' AND '20:00:00'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_not_between,
  MIN(tod) AS min_tod,
  MAX(tod) AS max_tod
FROM t
"""


@register(
    "regress_time_type_compare",
    oracle=_TIME_TYPE_SQL.format(TOD="strftime(ts, '%H:%M:%S')"),
    doc="issue405/417/429/995: TIME range compare / BETWEEN / CONVERT(.., TIME)",
)
def regress_time_type_compare(spark, sf_dir):
    return run_sql(
        spark, _TIME_TYPE_SQL.format(TOD="date_format(ts, 'HH:mm:ss')"), sf_dir
    )


# --------------------------------------------------------------------------
# issue682: zero dates.  MySQL non-strict stores '0000-00-00' for an
# out-of-range DATE; parquet/Spark cannot represent it, so the engine's
# documented mapping (TESTDATA/SCALING stance) is zero-date -> NULL at
# ingest — which makes `a = 0` select exactly the rows MySQL shows as
# zero dates and DELETE WHERE a IS NULL / a = 0 behave like the issue's
# script.  The entry pins the ingest mapping + the delete arithmetic.
_ZERO_DATE_SQL = """
WITH raw AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN '0000-00-00'
              WHEN o_orderkey % 10 = 5 THEN NULL
              ELSE CAST(CAST(o_orderdate AS DATE) AS {STR}) END AS d_raw
  FROM orders WHERE o_orderkey <= 1000
),
ingested AS (
  SELECT o_orderkey,
         CASE WHEN d_raw = '0000-00-00' THEN NULL
              ELSE CAST(d_raw AS DATE) END AS a
  FROM raw
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(CASE WHEN a IS NULL THEN 1 END) AS BIGINT) AS n_null_after,
  CAST(COUNT(CASE WHEN a = DATE '2022-10-20' THEN 1 END) AS BIGINT) AS n_eq_date,
  CAST(COUNT(a) AS BIGINT) AS n_kept
FROM ingested
"""


@register(
    "regress_zero_date_ingest",
    oracle=_ZERO_DATE_SQL.format(STR="VARCHAR"),
    doc="issue682: zero-date '0000-00-00' -> NULL ingest mapping + delete arithmetic",
)
def regress_zero_date_ingest(spark, sf_dir):
    return run_sql(spark, _ZERO_DATE_SQL.format(STR="STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue1107: the case-when pivot over a LEFT JOIN grouped by the left
# key — the ONLY_FULL_GROUP_BY-safe spelling (MAX over the conditional)
# that the issue's query needed; unmatched left rows must produce a
# row of NULL pivot cells, not vanish.
_PIVOT_LEFT_SQL = """
SELECT a.n_nationkey AS id,
       a.n_name AS unitsn,
       MAX(CASE WHEN UPPER(b.s_name) LIKE '%1%' THEN b.s_name END) AS v1,
       MAX(CASE WHEN UPPER(b.s_name) LIKE '%2%' THEN b.s_name END) AS v2,
       MAX(CASE WHEN UPPER(b.s_name) LIKE '%3%' THEN b.s_name END) AS v3,
       CAST(COUNT(b.s_suppkey) AS BIGINT) AS n_matched
FROM nation a
LEFT JOIN supplier b
  ON a.n_nationkey = b.s_nationkey AND b.s_suppkey <= 60
GROUP BY a.n_nationkey, a.n_name
ORDER BY id
"""


@register(
    "regress_pivot_left_join_group",
    oracle=_PIVOT_LEFT_SQL,
    doc="issue1107: MAX(CASE) pivot over LEFT JOIN grouped by left key",
)
def regress_pivot_left_join_group(spark, sf_dir):
    return run_sql(spark, _PIVOT_LEFT_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue829 / issue995: ancient datetimes (years 1111-1414) — equality,
# IN lists, range compares and EXTRACT must behave across the Julian/
# Gregorian boundary region; both engines use proleptic Gregorian, so
# results must agree exactly (parquet int64 micros carry the values).
_ANCIENT_SQL = """
WITH t AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE)
              - ((EXTRACT(year FROM o_orderdate) - 1111) * 365) * INTERVAL 1 DAY
              - (o_orderkey % 300) * 365 * INTERVAL 1 DAY
              AS TIMESTAMP) AS dt
  FROM orders WHERE o_orderkey <= 600
)
SELECT
  CAST(COUNT(CASE WHEN dt < TIMESTAMP '1400-01-01 00:00:00' THEN 1 END)
    AS BIGINT) AS n_before_1400,
  CAST(COUNT(CASE WHEN dt > TIMESTAMP '1111-11-13 00:00:00' THEN 1 END)
    AS BIGINT) AS n_after_1111,
  CAST(MIN(EXTRACT(year FROM dt)) AS BIGINT) AS min_year,
  CAST(MAX(EXTRACT(year FROM dt)) AS BIGINT) AS max_year,
  SUBSTRING(CAST(MIN(dt) AS {STR2}), 1, 19) AS min_dt
FROM t
"""


@register(
    "regress_ancient_datetime",
    # min_dt as text: pandas timestamp[ns] cannot represent years before
    # 1677, so the timestamp itself would overflow in toPandas
    oracle=_ANCIENT_SQL.format(STR2="VARCHAR"),
    doc="issue829/995: pre-1600 datetime compare/extract (proleptic Gregorian)",
)
def regress_ancient_datetime(spark, sf_dir):
    return run_sql(spark, _ANCIENT_SQL.format(STR2="STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue538: user-defined functions.  The reference routes CREATE
# FUNCTION to MySQL; the modern analogs are Spark 4 SQL UDFs (CREATE
# TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>) and DuckDB MACROs —
# both engines REGISTER a named scalar function and call it from a
# query, which is the surface the issue exercises (a smoothing function
# over order totals).
@register(
    "sql_scalar_udf",
    oracle="""
SELECT o_orderkey,
       CAST(round(CAST(0.9 * o_totalprice + 5000.0 AS DECIMAL(38,10)), 2) AS DOUBLE) AS smoothed,
       CAST(CASE WHEN o_totalprice > 100000 THEN 'high'
                 WHEN o_totalprice > 30000 THEN 'mid'
                 ELSE 'low' END AS VARCHAR) AS bucket3
FROM orders
WHERE o_orderkey <= 400
ORDER BY o_orderkey
""",
    doc="issue538: CREATE FUNCTION (Spark SQL UDF) ~ DuckDB MACRO scalar registration",
)
def sql_scalar_udf(spark, sf_dir):
    load_tables(spark, sf_dir)
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS smooth_price")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS bucket3")
    spark.sql(
        "CREATE TEMPORARY FUNCTION smooth_price(p DOUBLE) RETURNS DOUBLE "
        "RETURN CAST(round(CAST(0.9 * p + 5000.0 AS DECIMAL(38,10)), 2) AS DOUBLE)"
    )
    spark.sql(
        "CREATE TEMPORARY FUNCTION bucket3(p DOUBLE) RETURNS STRING "
        "RETURN CASE WHEN p > 100000 THEN 'high' "
        "WHEN p > 30000 THEN 'mid' ELSE 'low' END"
    )
    return spark.sql(
        """
SELECT o_orderkey,
       smooth_price(o_totalprice) AS smoothed,
       bucket3(o_totalprice) AS bucket3
FROM orders
WHERE o_orderkey <= 400
ORDER BY o_orderkey
"""
    )


# --------------------------------------------------------------------------
# issue1152: REPLACE INTO a table whose PRIMARY KEY is COMPOSITE
# (id, id1) — the replace must key on the FULL tuple; a row matching on
# only one component inserts rather than replaces.
@register(
    "dml_replace_composite_pk",
    oracle="""
WITH target AS (
  SELECT o_orderkey AS id, CAST(o_orderkey % 3 AS BIGINT) AS id1,
         o_orderstatus AS payload
  FROM orders WHERE o_orderkey <= 120
),
batch AS (
  SELECT o_orderkey AS id, CAST(o_orderkey % 5 AS BIGINT) AS id1,
         'NEW' AS payload
  FROM orders WHERE o_orderkey BETWEEN 100 AND 140
)
SELECT id, id1, payload,
       (payload = 'NEW') AS replaced
FROM (
  SELECT t.id, t.id1, t.payload
  FROM target t
  WHERE NOT EXISTS (SELECT 1 FROM batch b
                    WHERE b.id = t.id AND b.id1 = t.id1)
  UNION ALL
  SELECT id, id1, payload FROM batch
)
ORDER BY id, id1
""",
    doc="issue1152: REPLACE INTO with a composite (id, id1) primary key",
)
def dml_replace_composite_pk(spark, sf_dir):
    o = load_tables(spark, sf_dir)["orders"]
    target = o.filter(o["o_orderkey"] <= 120).select(
        o["o_orderkey"].alias("id"),
        (o["o_orderkey"] % 3).cast("long").alias("id1"),
        o["o_orderstatus"].alias("payload"),
    )
    batch = o.filter(o["o_orderkey"].between(100, 140)).select(
        o["o_orderkey"].alias("id"),
        (o["o_orderkey"] % 5).cast("long").alias("id1"),
        F.lit("NEW").alias("payload"),
    )
    survivors = target.join(batch.select("id", "id1"), ["id", "id1"], "left_anti")
    return (
        survivors.unionByName(batch)
        .withColumn("replaced", F.col("payload") == "NEW")
        .orderBy("id", "id1")
    )


# --------------------------------------------------------------------------
# issue1625: hex literals (x'F242') compared against string/binary
# columns under a binary collation — the byte-level equality path.
# Spark's X'..' literal is BINARY; DuckDB compares on decoded blobs.
@register(
    "regress_hex_literal_compare",
    oracle="""
WITH t AS (
  SELECT c_custkey,
         encode(substring(c_name, 1, 2)) AS b2
  FROM customer WHERE c_custkey <= 500
)
SELECT
  CAST(COUNT(CASE WHEN b2 = encode('Cu') THEN 1 END) AS BIGINT)
    AS n_eq_cu,
  CAST(COUNT(CASE WHEN b2 <> encode('AB') THEN 1 END) AS BIGINT)
    AS n_ne_ab,
  CAST(COUNT(CASE WHEN hex(b2) = '4375' THEN 1 END) AS BIGINT) AS n_hex_eq
FROM t
""",
    doc="issue1625: x'..' hex-literal byte compares against binary columns",
)
def regress_hex_literal_compare(spark, sf_dir):
    c = load_tables(spark, sf_dir)["customer"]
    b2 = F.substring(c["c_name"], 1, 2).cast("binary")
    t = c.filter(c["c_custkey"] <= 500).select(b2.alias("b2"))
    return t.agg(
        F.count(F.when(F.col("b2") == F.expr("X'4375'"), 1))
        .cast("long")
        .alias("n_eq_cu"),
        F.count(F.when(F.col("b2") != F.expr("X'4142'"), 1))
        .cast("long")
        .alias("n_ne_ab"),
        F.count(F.when(F.hex(F.col("b2")) == "4375", 1))
        .cast("long")
        .alias("n_hex_eq"),
    )


# --------------------------------------------------------------------------
# issue959: string-vs-number comparison context.  The engine compared
# VARCHAR ids as doubles, so two 19-digit ids differing in the last
# digit ('...585' vs '...587', both past 2^53) matched each other.
# Pinned both directions: a STRING literal compares as a string (exact,
# no coercion — the ids stay distinct), while a NUMERIC literal pulls
# the column into double context ('15.9', '+15.9', '15.90' all equal
# 15.9; 'abcd' is NULL, not an error — spelled TRY_CAST on both
# engines because ANSI Spark would otherwise raise on 'abcd').
_STRNUM_SQL = """
WITH t AS (
  SELECT CASE CAST(o_orderkey % 7 AS INT)
           WHEN 0 THEN '1547034559760195585'
           WHEN 1 THEN '1547034559760195587'
           WHEN 2 THEN '15.9'
           WHEN 3 THEN '+15.9'
           WHEN 4 THEN '-15.9'
           WHEN 5 THEN 'abcd'
           ELSE '0' END AS device_id
  FROM orders WHERE o_orderkey <= 700
)
SELECT
  CAST(COUNT(CASE WHEN device_id = '1547034559760195585' THEN 1 END) AS BIGINT)
    AS n_str_eq_585,
  CAST(COUNT(CASE WHEN device_id != '1547034559760195585' THEN 1 END) AS BIGINT)
    AS n_str_ne_585,
  CAST(COUNT(CASE WHEN device_id = '15.9' THEN 1 END) AS BIGINT) AS n_str_eq_159,
  CAST(COUNT(CASE WHEN device_id = '+15.9' THEN 1 END) AS BIGINT) AS n_str_eq_p159,
  CAST(COUNT(CASE WHEN TRY_CAST(device_id AS DOUBLE) = 15.9 THEN 1 END) AS BIGINT)
    AS n_num_eq_159,
  CAST(COUNT(CASE WHEN TRY_CAST(device_id AS DOUBLE) = -15.9 THEN 1 END) AS BIGINT)
    AS n_num_eq_neg,
  CAST(COUNT(CASE WHEN TRY_CAST(device_id AS DOUBLE) IS NULL THEN 1 END) AS BIGINT)
    AS n_non_numeric,
  CAST(COUNT(CASE WHEN device_id = '0' THEN 1 END) AS BIGINT) AS n_str_zero
FROM t
"""


@register(
    "regress_string_numeric_context",
    oracle=_STRNUM_SQL,
    doc="issue959: 19-digit string ids stay exact; numeric context coerces to double",
)
def regress_string_numeric_context(spark, sf_dir):
    return run_sql(spark, _STRNUM_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1175: the TIME type's SIGNED, >24h value space — MySQL TIME
# spans -838:59:59 .. 838:59:59 (a duration, not a time-of-day).
# Model: signed seconds with the MySQL clamp at +/-3020399, displayed
# back as [-]HHH:MM:SS.  Both engines run the same arithmetic over
# constructed 'H:MM:SS' strings (positive and negative, some beyond
# the clamp).
_TIME_RANGE_SQL = """
WITH raw AS (
  SELECT o_orderkey,
         CAST(CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN 0
           WHEN 1 THEN -3020399      -- -838:59:59 (min legal)
           WHEN 2 THEN 3020399      --  838:59:59 (max legal)
           WHEN 3 THEN o_orderkey * -720    -- negative, in range
           WHEN 4 THEN o_orderkey * 3600 + 59  -- may exceed the clamp
           ELSE 19815               --  05:30:15
         END AS BIGINT) AS raw_secs
  FROM orders WHERE o_orderkey <= 600
),
clamped AS (
  SELECT o_orderkey,
         GREATEST(LEAST(raw_secs, 3020399), -3020399) AS secs
  FROM raw
)
SELECT o_orderkey, secs,
       CASE WHEN secs < 0 THEN '-' ELSE '' END ||
       CAST(CAST(FLOOR(ABS(secs) / 3600) AS BIGINT) AS {STR}) || ':' ||
       lpad(CAST(CAST(FLOOR((ABS(secs) % 3600) / 60) AS BIGINT) AS {STR}), 2, '0')
       || ':' ||
       lpad(CAST(CAST(ABS(secs) % 60 AS BIGINT) AS {STR}), 2, '0') AS tdisplay,
       CAST(secs != raw_secs AS INT) AS clamped_flag
FROM clamped JOIN raw USING (o_orderkey)
ORDER BY o_orderkey
"""


@register(
    "regress_time_range_clamp",
    oracle=_TIME_RANGE_SQL.format(STR="VARCHAR"),
    doc="issue1175: signed >24h TIME values with the +/-838:59:59 clamp",
)
def regress_time_range_clamp(spark, sf_dir):
    return run_sql(spark, _TIME_RANGE_SQL.format(STR="STRING"), sf_dir)


# --------------------------------------------------------------------------
# issue1708: nested LEFT JOIN grouping — t1 LEFT JOIN (t2 LEFT JOIN t3
# ON inner-cond AND literal) ON outer-cond WHERE t1-filter.  The
# parenthesized join tree must evaluate inner-first (t2 rows keep their
# unmatched-NULL t3 side BEFORE joining to t1); flattening it changes
# the result.  Same text on both engines.
_NESTED_LEFT_SQL = """
SELECT n.n_nationkey AS id, n.n_name AS name,
       s.s_suppkey AS s_id, c.c_custkey AS c_id
FROM nation n
LEFT JOIN (supplier s LEFT JOIN customer c
           ON c.c_nationkey = s.s_nationkey AND c.c_custkey = 5)
  ON n.n_nationkey = s.s_nationkey AND s.s_suppkey <= 20
WHERE n.n_nationkey <= 12
ORDER BY id, s_id, c_id
"""


@register(
    "regress_nested_left_join",
    oracle=_NESTED_LEFT_SQL,
    doc="issue1708: parenthesized LEFT JOIN tree evaluates inner-first",
)
def regress_nested_left_join(spark, sf_dir):
    return run_sql(spark, _NESTED_LEFT_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1808 / issue1864: DECIMAL type-ladder edges — decimal UNION ALL
# string (common type string; decimal renders with its scale), decimal
# UNION ALL int literal (common type decimal, literal widens to x.00),
# an IN probe with a 16-digit literal against DECIMAL(18,0), and the
# derived-table alias path (xxx.x) over the widened union.  Outputs are
# value-compared as strings/doubles so engine-internal decimal widths
# cannot skew the driver hash.
_DECIMAL_LADDER_SQL = """
WITH t1 AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS c1,
                   CAST(o_orderkey AS DECIMAL(18,0)) AS ck
            FROM orders WHERE o_orderkey <= 120),
u_str AS (
  SELECT CAST(c1 AS {STR}) AS v FROM t1
  UNION ALL
  SELECT 'aaa' AS v FROM t1 WHERE ck IN (3000000000027265)
),
u_num AS (
  SELECT c1 AS x FROM t1
  UNION ALL
  SELECT CAST(1 AS DECIMAL(18,2)) AS x FROM t1 WHERE ck <= 60
)
SELECT
  CAST((SELECT COUNT(*) FROM u_str) AS BIGINT) AS n_str_union,
  (SELECT MIN(v) FROM u_str) AS min_str,
  CAST((SELECT COUNT(*) FROM (SELECT xxx.x FROM u_num xxx WHERE xxx.x = 1.00) q)
    AS BIGINT) AS n_ones,
  CAST((SELECT CAST(SUM(x) AS DOUBLE) FROM u_num) AS DOUBLE) AS sum_all
"""


@register(
    "regress_decimal_type_ladder",
    oracle=_DECIMAL_LADDER_SQL.format(STR="VARCHAR"),
    doc="issue1808/1864: decimal UNION string/int, 16-digit IN probe, alias path",
)
def regress_decimal_type_ladder(spark, sf_dir):
    return run_sql(spark, _DECIMAL_LADDER_SQL.format(STR="STRING"), sf_dir)


# --------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operators): the modern linear query
# surface.  Same SEMANTICS as the standard form the DuckDB oracle runs;
# the entry pins that the piped text produces the identical frame.
_PIPE_SQL = """
FROM orders
|> WHERE o_orderkey <= 2000
|> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
               AS total
   GROUP BY o_orderstatus, o_orderpriority
|> WHERE n > 5
|> ORDER BY o_orderstatus, o_orderpriority
"""


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey <= 2000
GROUP BY o_orderstatus, o_orderpriority
HAVING COUNT(*) > 5
ORDER BY o_orderstatus, o_orderpriority
""",
    doc="Spark 4 SQL pipe syntax (|> WHERE/AGGREGATE/ORDER) vs standard-form oracle",
)
def sql_pipe_syntax(spark, sf_dir):
    return run_sql(spark, _PIPE_SQL, sf_dir)


# --------------------------------------------------------------------------
# unsigned_greatest.test / unsigned_least.test: GREATEST/LEAST ladders
# over MIXED signed/unsigned/decimal/double operand sets, plus the
# `WHERE GREATEST(...) <> col` filter shape the files use to assert
# which operand won.  The reference's unsigned columns are modelled as
# non-negative BIGINTs (offset-shifted, the files' own construction:
# CUTINYINT = CTINYINT + 100 etc.).  One real dialect edge is pinned
# explicitly: MySQL's GREATEST/LEAST return NULL when ANY operand is
# NULL, while Spark and DuckDB both skip NULLs — the shared text
# spells the MySQL semantic with an explicit CASE guard so both
# engines compute the MySQL answer.
_GREATEST_LADDER_SQL = """
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_linenumber AS BIGINT)              AS c_tiny,
         CAST(l_quantity AS BIGINT)                AS c_small,
         CAST(l_partkey AS BIGINT)                 AS c_int,
         CAST(l_orderkey AS BIGINT) * 1000         AS c_big,
         CAST(l_extendedprice AS DECIMAL(18,2))    AS c_dec18,
         CAST(l_discount AS DECIMAL(4,2))          AS c_dec4,
         CAST(l_tax AS DOUBLE)                     AS c_double,
         CAST(l_quantity AS BIGINT) + 100          AS u_tiny,
         CAST(l_partkey AS BIGINT) + 20000         AS u_small,
         CASE WHEN l_linenumber % 3 = 0 THEN NULL
              ELSE CAST(l_suppkey AS BIGINT) END   AS nv
  FROM lineitem WHERE l_orderkey <= 120
)
SELECT l_orderkey, l_linenumber,
  CAST(GREATEST(c_big, c_int, c_small, c_tiny, 10) AS BIGINT) AS g_ints,
  CAST(LEAST(c_big, c_int, c_small, c_tiny, 10) AS BIGINT)    AS l_ints,
  CAST(GREATEST(c_tiny, -5) AS BIGINT)                        AS g_neg_lit,
  CAST(LEAST(u_tiny, u_small, c_small) AS BIGINT)             AS l_unsigned,
  CAST(GREATEST(c_dec4, CAST(u_tiny AS DECIMAL(18,2)),
                CAST(10 AS DECIMAL(18,2))) AS DOUBLE)         AS g_dec_u,
  CAST(LEAST(c_dec18, CAST(c_big AS DECIMAL(18,2))) AS DOUBLE) AS l_dec_big,
  CAST(GREATEST(c_double, CAST(c_dec4 AS DOUBLE),
                CAST(c_small AS DOUBLE)) AS DOUBLE)           AS g_mix3,
  CASE WHEN nv IS NULL THEN NULL
       ELSE CAST(GREATEST(c_small, nv) AS BIGINT) END         AS g_null_prop,
  CAST(CASE WHEN GREATEST(c_big, c_small, c_tiny, 10) <> c_big
            THEN 1 ELSE 0 END AS BIGINT)                      AS big_not_top,
  CAST(CASE WHEN LEAST(c_tiny, c_small, u_tiny) <> c_tiny
            THEN 1 ELSE 0 END AS BIGINT)                      AS tiny_not_least
FROM t
ORDER BY l_orderkey, l_linenumber
"""


@register(
    "regress_greatest_least_mixed",
    oracle=_GREATEST_LADDER_SQL,
    doc="unsigned_greatest/unsigned_least MTR: mixed-type GREATEST/LEAST ladders "
    "+ <>-filter shape + MySQL any-NULL propagation spelled explicitly",
)
def regress_greatest_least_mixed(spark, sf_dir):
    return run_sql(spark, _GREATEST_LADDER_SQL, sf_dir)


# --------------------------------------------------------------------------
# select_precision.test + empty_string_not_null.test: numeric-literal
# typing and precision edges.  MySQL's decimal literals make
# (.1 + .2) = .3 TRUE (exact DECIMAL arithmetic) while the float
# spelling is FALSE — Spark 4 (ANSI) and DuckDB type bare decimal
# literals the same way, so the shared text pins both.  ROUND with
# negative digits (tens/hundreds) over FLOAT32 inputs; division by
# zero is NULL in MySQL non-strict SELECTs, spelled as an explicit
# CASE guard (Spark ANSI would otherwise raise); the empty-string
# vs NULL distinction of the TEXT column counts rounds it out.
_PRECISION_SQL = """
WITH t AS (
  SELECT s_suppkey,
         CAST(CAST(s_acctbal AS FLOAT) AS DOUBLE) AS f,
         CASE WHEN s_suppkey % 5 = 0 THEN NULL
              WHEN s_suppkey % 5 = 1 THEN ''
              ELSE s_name END AS s,
         CAST(s_suppkey % 4 AS BIGINT) AS d
  FROM supplier WHERE s_suppkey <= 100
)
SELECT
  CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT)     AS n_null,
  CAST(SUM(CASE WHEN s = '' THEN 1 ELSE 0 END) AS BIGINT)        AS n_empty,
  CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
  CAST((0.1 + 0.2) = 0.3 AS INT)                                 AS dec_exact,
  CAST((0.1e0 + 0.2e0) = 0.3e0 AS INT)                           AS float_exact,
  CAST(0.01 * 0.01 AS DOUBLE)                                    AS dec_scale4,
  CAST(ROUND(MAX(f), -1) AS DOUBLE)                              AS r_tens,
  CAST(ROUND(MAX(f), -2) AS DOUBLE)                              AS r_hundreds,
  CAST(ROUND(MIN(f), 1) AS DOUBLE)                               AS r_one,
  CAST(ROUND(AVG(CASE WHEN d = 0 THEN NULL
                      ELSE CAST(100 AS DOUBLE) / d END), 9)
    AS DOUBLE)                                                   AS div0_guarded
FROM t
"""


@register(
    "regress_precision_modes",
    oracle=_PRECISION_SQL,
    doc="select_precision/empty_string_not_null MTR: decimal-literal exactness, "
    "negative-digit ROUND on FLOAT32, guarded div-by-zero, ''-vs-NULL counts",
)
def regress_precision_modes(spark, sf_dir):
    return run_sql(spark, _PRECISION_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue1662 (and the same idiom in issue1696/1707): the user-variable
# GROUP COUNTER — @g := IF(val = @prev, @g, @g + 1), @prev := val over
# an ORDER BY — MySQL's session-state spelling of gaps-and-islands
# group numbering.  The relational translation is LAG + a running SUM
# of change flags (start-of-group = prev IS NULL OR changed), identical
# text on both engines.  The second projection pins the file's mixed
# compare (id vs @prev VALUE — the variables deliberately cross).
# Dialect pin only: the bounded global window is the parity harness;
# the scale path partitions the window by a coarse key (SCALING.md).
_GROUP_COUNTER_SQL = """
WITH t AS (
  SELECT o_orderkey AS id, CAST(o_custkey % 7 AS BIGINT) AS value
  FROM orders WHERE o_orderkey <= 300
), w AS (
  SELECT id, value,
         LAG(value) OVER (ORDER BY value, id) AS prev_value
  FROM t
)
SELECT id, value,
  CAST(SUM(CASE WHEN prev_value IS NULL OR value <> prev_value
                THEN 1 ELSE 0 END)
       OVER (ORDER BY value, id ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS group_id,
  CAST(SUM(CASE WHEN prev_value IS NULL OR id <> prev_value
                THEN 1 ELSE 0 END)
       OVER (ORDER BY value, id ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS group_id_mixed
FROM w
ORDER BY value, id
"""


@register(
    "regress_user_var_group_counter",
    oracle=_GROUP_COUNTER_SQL,
    doc="issue1662/1696/1707: @g := IF(val=@prev,@g,@g+1) group counter -> "
    "LAG + running SUM of change flags",
)
def regress_user_var_group_counter(spark, sf_dir):
    return run_sql(spark, _GROUP_COUNTER_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue887: the MySQL CHAINED-ON nested join syntax — `t1 LEFT JOIN t2
# LEFT JOIN t3 ON inner ON outer` parses as t1 LEFT JOIN (t2 LEFT JOIN
# t3 ON inner) ON outer (SQL nested join), NOT as a left-deep chain;
# the reference mis-shaped these trees under IS NULL / IS NOT NULL
# WHERE filters.  Five variants (left/right nested x null/notnull +
# the no-ON inner join, which MySQL treats as CROSS) are each reduced
# to (count, per-side coalesced checksums) so one tagged result table
# pins all shapes.  Same text both engines (DuckDB parses chained ON;
# the MySQL bare `INNER JOIN` with no ON is spelled CROSS JOIN, its
# standard equivalent).  Spark's parser rejects the chained-ON
# spelling, so the oracle keeps MySQL's literal chained text while the
# Spark side uses the explicit parenthesized tree it denotes — the
# equivalence of the two spellings IS the issue887 claim under test.
_CHAINED_ON_SQL = """
WITH t1 AS (SELECT n_nationkey AS a FROM nation),
     t2 AS (SELECT n_nationkey AS a FROM nation WHERE n_nationkey >= 5),
     t3 AS (SELECT n_nationkey AS a FROM nation WHERE n_nationkey >= 10)
SELECT tag, n, s1, s2, s3 FROM (
  SELECT 'left_null' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COALESCE(t1.a, -1)) AS BIGINT) AS s1,
         CAST(SUM(COALESCE(t2.a, -1)) AS BIGINT) AS s2,
         CAST(SUM(COALESCE(t3.a, -1)) AS BIGINT) AS s3
  FROM t1 LEFT JOIN {P1}t2 LEFT JOIN t3 ON t2.a = t3.a{P2} ON t1.a = t2.a
  WHERE t3.a IS NULL
  UNION ALL
  SELECT 'left_notnull', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(COALESCE(t1.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t2.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t3.a, -1)) AS BIGINT)
  FROM t1 LEFT JOIN {P1}t2 LEFT JOIN t3 ON t2.a = t3.a{P2} ON t1.a = t2.a
  WHERE t3.a IS NOT NULL
  UNION ALL
  SELECT 'right_null', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(COALESCE(t1.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t2.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t3.a, -1)) AS BIGINT)
  FROM t1 RIGHT JOIN {P1}t2 RIGHT JOIN t3 ON t2.a = t3.a{P2} ON t1.a = t2.a
  WHERE t3.a IS NULL
  UNION ALL
  SELECT 'right_notnull', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(COALESCE(t1.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t2.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t3.a, -1)) AS BIGINT)
  FROM t1 RIGHT JOIN {P1}t2 RIGHT JOIN t3 ON t2.a = t3.a{P2} ON t1.a = t2.a
  WHERE t3.a IS NOT NULL
  UNION ALL
  SELECT 'cross_notnull', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(COALESCE(t1.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t2.a, -1)) AS BIGINT),
         CAST(SUM(COALESCE(t3.a, -1)) AS BIGINT)
  FROM t1 CROSS JOIN t2 CROSS JOIN t3
  WHERE t3.a IS NOT NULL
) v
ORDER BY tag
"""


@register(
    "regress_chained_on_joins",
    oracle=_CHAINED_ON_SQL.format(P1="", P2=""),
    doc="issue887: chained-ON nested joins (left/right) under IS [NOT] NULL "
    "filters + bare-INNER-as-CROSS",
)
def regress_chained_on_joins(spark, sf_dir):
    return run_sql(spark, _CHAINED_ON_SQL.format(P1="(", P2=")"), sf_dir)


# --------------------------------------------------------------------------
# issue971: correlated EXISTS / NOT EXISTS battery — the inner query
# adds a second predicate of each comparison class (non-key equality,
# key = const, key > const, key < const) on top of the correlation,
# and the complementary NOT EXISTS rows must partition the outer table
# exactly.  The reference returned wrong rows when the extra inner
# predicate was a range on the correlated key.
_EXISTS_BATTERY_SQL = """
WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 200)
SELECT tag, n, chk FROM (
  SELECT 'ex_eq_attr' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c_custkey) AS BIGINT) AS chk
  FROM c WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
  UNION ALL
  SELECT 'ex_eq_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_custkey = 2)
  UNION ALL
  SELECT 'ex_gt_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_custkey > 100)
  UNION ALL
  SELECT 'ex_lt_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_custkey < 100)
  UNION ALL
  SELECT 'nex_eq_attr', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')
  UNION ALL
  SELECT 'nex_eq_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_custkey = 2)
  UNION ALL
  SELECT 'nex_gt_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_custkey > 100)
  UNION ALL
  SELECT 'nex_lt_key', CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
  FROM c WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_custkey < 100)
) v
ORDER BY tag
"""


@register(
    "regress_exists_battery",
    oracle=_EXISTS_BATTERY_SQL,
    doc="issue971: EXISTS/NOT EXISTS with extra inner predicates of each "
    "comparison class; complements must partition the outer table",
)
def regress_exists_battery(spark, sf_dir):
    return run_sql(spark, _EXISTS_BATTERY_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue422: GROUP BY over non-integer key types — double, float32
# (engine-rounded), expression keys (q + 0.0), and text — plus the
# file's implicit-comma-join MIN(score+0.0) with a pushed filter.
# Group keys themselves never reach the output (float32 keys would be
# hash-hostile); each variant reduces to (group count, max group size,
# integer checksum).  The MIN arm multiplies by 100 and rounds, so the
# 2-decimal money values compare integer-exact.
_GROUPBY_TYPES_SQL = """
WITH src AS (SELECT * FROM lineitem WHERE l_orderkey <= 2000)
SELECT tag, n_groups, max_cnt, chk FROM (
  SELECT 'by_int' AS tag, CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(MAX(c) AS BIGINT) AS max_cnt, CAST(SUM(c) AS BIGINT) AS chk
  FROM (SELECT COUNT(*) AS c FROM src GROUP BY l_linenumber) g
  UNION ALL
  SELECT 'by_double', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(SUM(c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM src
        GROUP BY CAST(l_quantity AS DOUBLE)) g
  UNION ALL
  SELECT 'by_float32', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(SUM(c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM src
        GROUP BY CAST(l_quantity + 0.05 AS FLOAT)) g
  UNION ALL
  SELECT 'by_expr', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(SUM(c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM src
        GROUP BY l_quantity + 0.0) g
  UNION ALL
  SELECT 'by_text', CAST(COUNT(*) AS BIGINT), CAST(MAX(c) AS BIGINT),
         CAST(SUM(c) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM src GROUP BY l_returnflag) g
  UNION ALL
  SELECT 'min_join', CAST(COUNT(*) AS BIGINT), CAST(MAX(n) AS BIGINT),
         CAST(ROUND(SUM(m) * 100) AS BIGINT)
  FROM (SELECT o_custkey, COUNT(*) AS n, MIN(o_totalprice + 0.0) AS m
        FROM orders, customer
        WHERE o_custkey = c_custkey AND o_orderkey <= 2000
        GROUP BY o_custkey) g
) v
ORDER BY tag
"""


@register(
    "regress_groupby_type_keys",
    oracle=_GROUPBY_TYPES_SQL,
    doc="issue422: GROUP BY double/float32/expr/text keys + implicit-join "
    "MIN(x+0.0)",
)
def regress_groupby_type_keys(spark, sf_dir):
    return run_sql(spark, _GROUPBY_TYPES_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue790: latest-row-per-group via a MAX(id) derived table INNER
# JOINed onto a LEFT JOIN chain — the pre-window-function idiom for
# "current balance = the newest statement row".  The INNER join on the
# per-group maximum must cancel the LEFT join's null-extension for
# groups that have rows, and drop row-less groups entirely.  Newest
# order per customer stands in for newest statement per account.
_LATEST_PER_GROUP_SQL = """
SELECT c.c_custkey AS custkey, c.c_name AS name,
       o.o_totalprice AS balance, o.o_orderdate AS asof
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
INNER JOIN (SELECT MAX(o_orderkey) AS ok
            FROM orders
            WHERE o_orderstatus IN ('F', 'O')
            GROUP BY o_custkey) last
  ON o.o_orderkey = last.ok
WHERE c.c_custkey <= 300
ORDER BY custkey
"""


@register(
    "regress_latest_per_group_join",
    oracle=_LATEST_PER_GROUP_SQL,
    doc="issue790: newest-row-per-group via MAX(id) derived-table join over "
    "a LEFT JOIN chain",
)
def regress_latest_per_group_join(spark, sf_dir):
    return run_sql(spark, _LATEST_PER_GROUP_SQL, sf_dir)


# --------------------------------------------------------------------------
# issue515 / issue981: boolean-valued timestamp comparisons projected
# THROUGH a derived table — `val NOT BETWEEN a AND b` and `val >=
# const` selected as columns (MySQL renders 0/1 ints) from
# `(SELECT * FROM t) AS A`.  The reference evaluated the re-aliased
# timestamp against the string literals wrongly once wrapped in the
# derived table.  Booleans are CAST to INT in the shared text.
_TS_BOOL_DERIVED_SQL = """
SELECT id,
       CAST(val NOT BETWEEN DATE '1996-01-01' AND DATE '1997-06-30'
            AS INT) AS not_between_flag,
       CAST(val >= DATE '1996-01-01' AS INT) AS ge_flag,
       CAST(val BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'
            AS INT) AS between_flag
FROM (SELECT o_orderkey AS id, o_orderdate AS val FROM orders) A
WHERE id <= 400
ORDER BY id
"""


@register(
    "regress_ts_not_between_derived",
    oracle=_TS_BOOL_DERIVED_SQL,
    doc="issue515/981: NOT BETWEEN / >= on a timestamp re-aliased through a "
    "derived table, selected as 0/1 flags",
)
def regress_ts_not_between_derived(spark, sf_dir):
    return run_sql(spark, _TS_BOOL_DERIVED_SQL, sf_dir)


# --------------------------------------------------------------------------
# LATERAL derived tables (beyond the reference — MySQL 5.7 has none;
# MySQL 8.0.14 added them): the correlated-subquery-in-FROM surface.
# Three shapes on one shared text: top-2-per-group via LATERAL ORDER
# BY..LIMIT (the canonical use), a LATERAL correlated aggregate, and
# LEFT JOIN LATERAL preserving match-less outer rows.  Spark 4 and
# DuckDB both parse the identical text.  Catalyst compiles the
# per-group LIMIT to WindowGroupLimit (partial map-side top-k before
# any exchange) + BroadcastHashJoin — never a nested-loop join, and
# the full table is cut to <= k rows/group BEFORE the shuffle.
_LATERAL_SQL = """
WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey <= 150)
SELECT v.tag, v.custkey, v.a, v.b FROM (
  SELECT 'top2' AS tag, c.c_custkey AS custkey,
         t.o_orderkey AS a, CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS b
  FROM c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
  UNION ALL
  SELECT 'agg', c.c_custkey, s.n, s.chk
  FROM c, LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(o_orderkey) AS BIGINT) AS chk
                   FROM orders o WHERE o.o_custkey = c.c_custkey) s
  WHERE s.n > 0
  UNION ALL
  SELECT 'left', c.c_custkey, t.o_orderkey,
         CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
  FROM c LEFT JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_totalprice > 400000
                            ORDER BY o_totalprice DESC LIMIT 1) t ON TRUE
) v
ORDER BY tag, custkey, a
"""


@register(
    "sql_lateral_topk",
    oracle=_LATERAL_SQL,
    doc="LATERAL derived tables (beyond the reference): per-group top-k "
    "LIMIT, correlated aggregate, LEFT JOIN LATERAL null-preservation",
)
def sql_lateral_topk(spark, sf_dir):
    return run_sql(spark, _LATERAL_SQL, sf_dir)
