"""Central query registry backing ``__spark_entry__.queries()`` /
``oracle_sql()``.

Each registered query is one implemented operator from SURVEY.md §2 (or
a scale extension). The Spark callable and the DuckDB oracle SQL must
produce identical (row-count, schema-names, values) results at sf0.01 —
alias every computed column the same on both sides.

Registration is decorator-based so operator modules can self-register;
this module imports them all at the bottom.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → rows-only check (for
    non-SQL-expressible ops like generators / streaming)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    from .sources import load_table

    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
# J1/J2/J3 — the reference's three join strategies on the same logical
# query (customer ⋈ orders). One oracle proves strategy-independence:
# RepartitionJoin.java / BroadcastJoin.java / MergeJoin.java all compute
# this same inner equi-join.
# --------------------------------------------------------------------------

_JOIN_CO_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_acctbal,
       o.o_orderkey, o.o_totalprice, o.o_orderstatus
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
"""


def _join_customer_orders(strategy: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .operators.joins import equi_join

        customer, orders = _load(spark, sf_dir, "customer", "orders")
        j = equi_join(customer, orders, "c_custkey", "o_custkey", "inner", strategy)
        return j.select("c_custkey", "c_name", "c_acctbal",
                        "o_orderkey", "o_totalprice", "o_orderstatus")

    return q


for _s in ("repartition", "broadcast", "merge"):
    register(f"join_{_s}", _JOIN_CO_ORACLE)(_join_customer_orders(_s))


@register(
    "join_dup_keys",
    """
    SELECT o.o_orderkey, o.o_custkey, l.l_partkey, l.l_linenumber,
           l.l_quantity, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def join_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate keys on the probe side (each order has many lineitems)
    — exercises the per-key cross-product semantics
    (RepartitionJoin.java:55-64)."""
    from .operators.joins import equi_join

    orders, lineitem = _load(spark, sf_dir, "orders", "lineitem")
    j = equi_join(orders, lineitem, "o_orderkey", "l_orderkey", "inner", "repartition")
    return j.select("o_orderkey", "o_custkey", "l_partkey", "l_linenumber",
                    "l_quantity", "l_extendedprice")


@register(
    "join_star_multiway",
    """
    SELECT r.r_name, n.n_name, COUNT(*) AS n_items,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway star join — beyond the reference (binary-only); dims are
    broadcast, fact shuffles once for the aggregate. At 100 TB the fact
    table never shuffles for the joins themselves."""
    from pyspark.sql import functions as F

    lineitem, orders, customer, nation, region = _load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    j = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — the broadcast mapper's existence filter
    (BroadcastJoin.java:111) generalized to a left-semi join."""
    from .operators.joins import equi_join

    customer, orders = _load(spark, sf_dir, "customer", "orders")
    return equi_join(customer, orders, "c_custkey", "o_custkey",
                     "left_semi", "broadcast").select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a pushed-down predicate on the right side (filter
    reaches the parquet scan; non-empty result at sf0.01)."""
    from .operators.joins import equi_join

    customer, orders = _load(spark, sf_dir, "customer", "orders")
    big = orders.filter("o_totalprice > 300000")
    return equi_join(customer, big, "c_custkey", "o_custkey",
                     "left_anti", "broadcast").select("c_custkey", "c_name")


@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import equi_join

    customer, orders = _load(spark, sf_dir, "customer", "orders")
    return equi_join(customer, orders, "c_custkey", "o_custkey", "left",
                     "merge").select("c_custkey", "c_name", "o_orderkey",
                                     "o_totalprice")


@register(
    "projection_key_extract",
    """
    SELECT l_orderkey AS k,
           CONCAT(CAST(l_orderkey AS VARCHAR), ',', CAST(l_partkey AS VARCHAR),
                  ',', CAST(l_linenumber AS VARCHAR)) AS row_str
    FROM lineitem
    """,
)
def projection_key_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — key extraction: project column i as key, keep the row as a
    delimited string (KeyExtractor.java:20-26)."""
    from pyspark.sql import functions as F

    (lineitem,) = _load(spark, sf_dir, "lineitem")
    return lineitem.select(
        F.col("l_orderkey").alias("k"),
        F.concat_ws(
            ",",
            F.col("l_orderkey").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("row_str"),
    )
