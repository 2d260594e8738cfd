"""The six partsupp-dependent TPC-H shapes (Q2/Q9/Q10/Q11/Q16/Q20).

The driver fixture ships no ``partsupp`` table, so these queries run
against a DERIVED partsupp: the distinct (l_partkey, l_suppkey) pairs
observed in lineitem, with ``ps_supplycost`` / ``ps_availqty``
synthesized by exact integer arithmetic on the keys (both engines
compute the identical CTE — see ``_PS_SQL`` / ``_partsupp``).  The
point of each query is its OPTIMIZER SHAPE, which survives the
adaptation intact:

  Q2  — correlated per-part min-cost scalar subquery (min table
        broadcast back over its own input, not re-scanned),
  Q9  — six-table profit join with a two-sum exact-decimal difference,
  Q10 — returned-item revenue top-20 (the only shape here that needs
        no partsupp; decimal-exact LIMIT boundary),
  Q11 — HAVING against a global scalar (1-row broadcast crossJoin),
  Q16 — count-distinct suppliers under a NOT-IN blacklist anti-join,
  Q20 — nested semi-join chain with a correlated per-pair threshold.

Reference tie-in: the reference's API tier composes at most two
tables per route (api/routers/analytics_routes.py:62-94 is its
groupwise-max rewrite); these certify the subquery-join rewrite class
SURVEY §4 attributes to the optimizer.  Q10's shape is the
returns-accountability report its models/listing.py status churn
would feed.

Determinism (house rules, see determinism recipes): money sums are
exact DECIMAL(20,8) per row then summed; Q9 keeps revenue and cost as
SEPARATE decimal sums and subtracts once (a fused decimal difference
would exceed Spark's 38-digit ceiling on the cost product's width);
Q11 is ALL-integer (supplycost is integer-valued by construction);
Q20's 0.5 factor is cross-multiplied away; Q10 orders its LIMIT on
the exact decimal sum with a unique-key tie-break.

Fixture adaptations beyond partsupp (same spirit as tpch_shapes.py's
note): part has no p_mfgr/p_container and p_type is a single word, so
Q2 filters (p_size, p_type) and emits p_brand for p_mfgr; supplier
has no s_comment, so Q16's complaint blacklist is s_acctbal < 0;
p_name is '<adjective> <noun>', so Q9/Q20 use '%rod%' / 'blue%'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query, T

_DEC = "decimal(20,8)"

# Derived partsupp: ps_supplycost in 1..1000 (integer-valued,
# DECIMAL(12,2)), ps_availqty in 1..40 (sized against the fixture's
# per-pair annual shipped quantity, ~25, so Q20's threshold does real
# work).  Multipliers are small primes; all arithmetic is int64-exact
# and engine-identical (keys are non-negative, so % agrees).
_PS_SQL = """partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(1 + (l_partkey * 7 + l_suppkey * 13) % 1000
                  AS DECIMAL(12,2)) AS ps_supplycost,
             CAST(1 + (l_partkey * 31 + l_suppkey * 17) % 40
                  AS BIGINT) AS ps_availqty
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp (see module docstring + ``_PS_SQL``).

    Plan/scale: ONE distinct-agg shuffle on (partkey, suppkey) — the
    natural partsupp key, which Q9/Q20 then join on, so AQE can reuse
    the exchange; the synthesized columns are map-side expressions."""
    pairs = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return pairs.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        (
            F.lit(1).cast("long")
            + (F.col("l_partkey") * 7 + F.col("l_suppkey") * 13) % 1000
        )
        .cast("decimal(12,2)")
        .alias("ps_supplycost"),
        (
            F.lit(1).cast("long")
            + (F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 40
        )
        .cast("long")
        .alias("ps_availqty"),
    )


@query(
    "min_cost_supplier_q2",
    f"""
    WITH {_PS_SQL},
    sn AS (
      SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT ps.ps_partkey, ps.ps_supplycost,
             sn.s_acctbal, sn.s_name, sn.n_name, p.p_brand
      FROM partsupp ps
      JOIN sn ON sn.s_suppkey = ps.ps_suppkey
      JOIN part p ON p.p_partkey = ps.ps_partkey
      WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name,
           ps_partkey AS p_partkey, p_brand,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM cand
    WHERE ps_supplycost = (SELECT min(c2.ps_supplycost) FROM cand c2
                           WHERE c2.ps_partkey = cand.ps_partkey)
    """,
    survey="tpch-q2",
    tags=("tpch", "partsupp"),
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every small-size
    LARGE part, the EUROPE suppliers whose supply cost equals that
    part's regional minimum — the correlated scalar-subquery pattern,
    decorrelated into an aggregate-and-rejoin (ALL min-ties surface,
    as in the spec).

    Plan/scale: supplier⋈nation⋈region collapses to a broadcast dim
    before touching partsupp; the (size, type) filter prunes part to
    ~1/20 at ITS scan, so the candidate set is small and the per-part
    min table broadcasts back over the SAME candidate frame — the
    base table is never re-scanned (the rewrite SURVEY §4 credits the
    reference's optimizer with).  Determinism: costs are integer-
    valued decimals, min/equality exact; no LIMIT, so there is no
    tie boundary at all — the full (part, supplier) min set is the
    answer in both engines."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_brand")
    )
    cand = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(sn), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "ps_partkey", "ps_supplycost",
            "s_acctbal", "s_name", "n_name", "p_brand",
        )
    )
    mn = cand.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    return (
        cand.join(F.broadcast(mn), "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


@query(
    "product_profit_q9",
    f"""
    WITH {_PS_SQL}
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(20,8)))
                - sum(CAST(CAST(ps.ps_supplycost AS DOUBLE) * l.l_quantity
                           AS DECIMAL(20,8)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%rod%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    survey="tpch-q9",
    tags=("tpch", "partsupp"),
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per (supplier nation,
    order year), revenue minus supply cost over every '%rod%' part —
    the six-table profit join.

    Plan/scale: part ('%rod%', ~1/8) and supplier⋈nation broadcast
    onto the fact stream map-side; partsupp arrives pre-partitioned
    on (partkey, suppkey) from its defining distinct, the SAME
    composite key this join uses.  At fixture scale the optimizer
    broadcasts EVERY join side including partsupp and orders (read
    from the plan: four BroadcastHashJoins, the only exchanges are
    the defining distinct, the group-by, and the output sort); at
    100 TB AQE swaps partsupp and orders to shuffle joins — partsupp
    reusing its defining exchange, orders shuffling on orderkey, the
    one unavoidable big-big shuffle (Q8 precedent).  Determinism: revenue
    and cost are kept as SEPARATE exact decimal sums and subtracted
    once — a fused per-row decimal difference would push Spark's
    result width past 38 digits and each engine degrades differently
    (determinism recipe).  The cost product is computed in double —
    exact, since supplycost ≤ 1000 and quantity ≤ 50 are both
    integer-valued (< 2^53) — then cast to DECIMAL(20,8) per row."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    p = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%rod%"))
        .select("p_partkey")
    )
    sn = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ps = _partsupp(spark, sf_dir)
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        _DEC
    )
    cost = (
        F.col("ps_supplycost").cast("double") * F.col("l_quantity")
    ).cast(_DEC)
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.select(
            "nation",
            F.year(F.to_utc_timestamp("o_orderdate", "UTC"))
            .cast("long")
            .alias("o_year"),
            rev.alias("_rev"),
            cost.alias("_cost"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("_rev") - F.sum("_cost")).cast("double").alias("sum_profit")
        )
        .orderBy("nation", "o_year")
    )


@query(
    "returned_item_reporting_q10",
    """
    SELECT c_custkey, c_name,
           CAST(rev_dec AS DOUBLE) AS revenue, c_acctbal, n_name
    FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(20,8))) AS rev_dec
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
        AND o.o_orderdate <  TIMESTAMP '1996-01-01'
        AND l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4
      ORDER BY rev_dec DESC, c.c_custkey
      LIMIT 20
    )
    """,
    survey="tpch-q10",
    tags=("tpch",),
)
def returned_item_reporting_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the top 20 customers by
    revenue lost to returns in one quarter, with their nation — the
    returns-accountability report (the reference's listing status
    churn, models/listing.py:66-241, feeds exactly this shape).

    Plan/scale: the quarter prunes orders at its scan and the
    returnflag prunes lineitem at ITS scan before the orderkey
    shuffle join; customer⋈nation broadcasts (customer prunes to the
    quarter's buyers via AQE at 100 TB — same note as Q8).  The top
    20 is TakeOrderedAndProject on the EXACT decimal revenue with
    c_custkey as the total-ordering tie-break, so the LIMIT boundary
    is a pure function of the data in both engines; the double cast
    happens after the cut."""
    o = (
        T(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cn = (
        T(spark, sf_dir, "customer")
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        _DEC
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("rev_dec"))
        .orderBy(F.desc("rev_dec"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@query(
    "important_stock_q11",
    f"""
    WITH {_PS_SQL},
    de AS (
      SELECT ps.ps_partkey,
             CAST(ps.ps_supplycost AS BIGINT) * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_regionkey = 3
    ),
    per_part AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS stock_value
                 FROM de GROUP BY 1)
    SELECT ps_partkey, stock_value
    FROM per_part
    WHERE stock_value * 1500 > (SELECT sum(stock_value) FROM per_part)
    ORDER BY ps_partkey
    """,
    survey="tpch-q11",
    tags=("tpch", "partsupp"),
)
def important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose in-region stock
    value exceeds a FRACTION OF THE GLOBAL TOTAL — HAVING against a
    global scalar subquery, the one aggregate shape where a second
    full pass lurks in the naive plan.

    Decorrelation: the per-part aggregate is computed ONCE; the
    global total is a second agg OVER THAT RESULT (never re-reading
    partsupp) crossJoined back as a 1-row broadcast — the catalog's
    `_id_offset` pattern, zero extra exchanges beyond the 1-row one.
    Determinism: ALL-integer — supplycost is integer-valued by
    construction and cast to BIGINT, so value, total, and the
    cross-multiplied threshold (value·1500 > total, the 1/1500
    fraction with no float division anywhere) are exact int64 in both
    engines (max ≈ 2.6e11·1500, well inside int64).  The region
    filter (vs the spec's single nation) keeps the supplier side at
    15 of 100 rows — same broadcast shape, non-degenerate output."""
    n = T(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    s = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    per_part = (
        ps.select(
            "ps_partkey",
            (
                F.col("ps_supplycost").cast("long") * F.col("ps_availqty")
            ).alias("v"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("v").alias("stock_value"))
    )
    total = per_part.agg(F.sum("stock_value").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("stock_value") * 1500 > F.col("_total"))
        .select("ps_partkey", "stock_value")
        .orderBy("ps_partkey")
    )


@query(
    "parts_supplier_relation_q16",
    f"""
    WITH {_PS_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#12'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 23, 31, 40, 49)
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    survey="tpch-q16",
    tags=("tpch", "partsupp"),
)
def parts_supplier_relation_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    supplier counts per (brand, type, size) bucket, EXCLUDING a
    NOT-IN supplier blacklist (adapted: s_acctbal < 0 stands in for
    the spec's complaint-comment scan — supplier has no s_comment).

    Plan/scale: the blacklist is a broadcast LEFT ANTI join (the
    non-null blacklist makes NOT-IN ≡ anti-join — same rewrite the
    P9 row certifies); part's three predicates prune at its scan and
    broadcast onto partsupp; the count-distinct is one partial-
    distinct shuffle on the (brand, type, size) grouping key.  All
    outputs are ints/strings — no float anywhere."""
    bad = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        T(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#12")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 5, 9, 15, 23, 31, 40, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    ps = (
        _partsupp(spark, sf_dir)
        .join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
    )
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "potential_promotion_q20",
    f"""
    WITH {_PS_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'blue%')
          AND CAST(ps.ps_availqty AS DECIMAL(12,2)) * 2 > sh.sum_qty
      )
    ORDER BY s.s_suppkey
    """,
    survey="tpch-q20",
    tags=("tpch", "partsupp"),
)
def potential_promotion_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): region-2 suppliers
    holding MORE THAN HALF a year's shipped quantity of some 'blue'
    part — the nested semi-join chain (supplier ⊂ partsupp ⊂ part)
    with a correlated per-(part,supplier) threshold.

    Decorrelation: the spec's correlated scalar subquery (0.5 · sum
    of that pair's shipped qty) becomes an INNER join against the
    per-pair aggregate — equivalent because a pair with no 1995
    shipments yields a NULL comparison in the spec (row dropped) and
    no join match here.  The half factor is cross-multiplied
    (2·availqty > sum_qty) into exact decimal — no float threshold.
    Plan/scale: the 'blue' part list broadcasts as a semi-join onto
    partsupp; shipped aggregates map-side onto the SAME
    (partkey, suppkey) key partsupp is already partitioned on (its
    defining distinct), so the pair join reuses the exchange; the
    qualifying suppkey set (≤ |supplier|) broadcasts as the final
    left-semi into the 15-row supplier⋈nation side."""
    promo = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    shipped = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty")
        )
    )
    qualified = (
        _partsupp(spark, sf_dir)
        .join(
            F.broadcast(promo),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(
            F.col("ps_availqty").cast("decimal(12,2)") * 2 > F.col("sum_qty")
        )
        .select("ps_suppkey")
    )
    n = T(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
