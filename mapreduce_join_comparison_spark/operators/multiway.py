"""Multiway (hypercube / Shares) join — one-shuffle evaluation of a
cyclic join query.

The thesis discusses multiway hypercube joins as future work (ch. 5.4 /
ch. 7 "Further Work"); the reference implements none. This is the
classic Afrati–Ullman "Shares" / HyperCube algorithm (Optimizing joins
in a MapReduce environment, EDBT 2010) expressed Spark-natively:

For the triangle query  R(a,b) ⋈ S(b,c) ⋈ T(c,a)  a chain of two
binary joins needs TWO shuffles and materializes the (potentially huge)
R⋈S intermediate. HyperCube instead shuffles each input ONCE into a
3-D grid of p1×p2×p3 cells: a tuple R(a,b) is sent to cells
(h(a), h(b), *) — replicated p3 times — and symmetrically for S and T.
Every triangle (a,b,c) then materializes in exactly one cell
(h(a), h(b), h(c)), so no cross-cell dedup is needed. Replication
cost: |R|·p3 + |S|·p1 + |T|·p2 shuffled rows, versus |R⋈S| for the
chain plan — a win whenever the intermediate is large (dense graphs,
skewed keys).

Spark mapping: coordinate columns + one `explode` for the free axis,
a single `groupBy(cell)` shuffle, and a Pandas-UDF local join inside
each cell (`applyInPandas`) — the per-partition imperative step Spark's
built-in operators can't express (a 3-way simultaneous join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells(side: int, df: DataFrame, c1: str, c2: str,
           fixed: tuple[str, str], free: str, grid: dict[str, int]) -> DataFrame:
    """Tag tuples of one input with every grid cell they belong to:
    hash the two bound axes, explode the free axis."""
    # hash the CAST value so both inputs binding an axis agree even if
    # their column types differ (int vs bigint hash differently)
    coords = {
        fixed[0]: F.pmod(F.hash(F.col(c1).cast("long")), F.lit(grid[fixed[0]])),
        fixed[1]: F.pmod(F.hash(F.col(c2).cast("long")), F.lit(grid[fixed[1]])),
        free: F.explode(F.array(*[F.lit(i) for i in range(grid[free])])),
    }
    return df.select(
        F.col(c1).cast("long").alias("x1"),
        F.col(c2).cast("long").alias("x2"),
        F.lit(side).alias("side"),
        *[coords[ax].alias(f"_{ax}") for ax in ("pa", "pb", "pc")],
    )


def hypercube_triangle_join(
    r: DataFrame, s: DataFrame, t: DataFrame, grid: tuple[int, int, int] = (4, 4, 2)
) -> DataFrame:
    """Triangle query R(a,b) ⋈_b S(b,c) ⋈_{c,a} T(c,a) in ONE shuffle.

    Inputs must expose exactly the columns ``(a, b)`` / ``(b, c)`` /
    ``(c, a)`` (rename first). ``grid=(p1,p2,p3)`` shares the reducers
    across the three join attributes; p1·p2·p3 should be ≥ the
    cluster's parallelism (at 100 TB: hundreds per axis — replication
    grows with the cube root of the reducer count, the Shares
    optimum for symmetric inputs).

    Returns the bag of triangles (a, b, c) — bag semantics identical
    to the SQL 3-way join when inputs are duplicate-free.
    """
    p1, p2, p3 = grid
    g = {"pa": p1, "pb": p2, "pc": p3}
    # inner equi-join semantics: NULL keys never match, so drop them
    # before the cell fan-out — they would otherwise reach the pandas
    # cell join as NaN, and pd.merge treats NaN keys as EQUAL,
    # emitting "triangles" the SQL/chain plan never produces (the two
    # strategies must agree on every input)
    r = r.dropna(subset=["a", "b"])
    s = s.dropna(subset=["b", "c"])
    t = t.dropna(subset=["c", "a"])
    tagged = (
        _cells(0, r, "a", "b", ("pa", "pb"), "pc", g)
        .unionByName(_cells(1, s, "b", "c", ("pb", "pc"), "pa", g))
        .unionByName(_cells(2, t, "c", "a", ("pc", "pa"), "pb", g))
    )

    def join_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        rr = pdf[pdf["side"] == 0][["x1", "x2"]]
        rr.columns = ["a", "b"]
        ss = pdf[pdf["side"] == 1][["x1", "x2"]]
        ss.columns = ["b", "c"]
        tt = pdf[pdf["side"] == 2][["x1", "x2"]]
        tt.columns = ["c", "a"]
        if rr.empty or ss.empty or tt.empty:
            return pd.DataFrame({"a": [], "b": [], "c": []}, dtype="int64")
        return rr.merge(ss, on="b").merge(tt, on=["c", "a"])[["a", "b", "c"]]

    return tagged.groupBy("_pa", "_pb", "_pc").applyInPandas(
        join_cell, schema="a long, b long, c long"
    )


def chain_triangle_join(r: DataFrame, s: DataFrame, t: DataFrame) -> DataFrame:
    """The binary-join chain plan for the same triangle query — two
    join stages that Catalyst plans freely (broadcast when a side is
    small, shuffle otherwise)."""
    return (
        r.join(s, "b")
        .join(t, ["c", "a"])
        .select("a", "b", "c")
    )


def triangle_join(
    r: DataFrame,
    s: DataFrame,
    t: DataFrame,
    strategy: str = "chain",
    grid: tuple[int, int, int] = (4, 4, 2),
) -> DataFrame:
    """Triangle query with an explicit strategy choice.

    ``chain`` (the default): two binary joins — all-JVM, whole-stage
    codegen, Catalyst broadcasts small sides and AQE splits skewed
    partitions; the right plan whenever the R⋈S intermediate is
    manageable, which is the common case.

    ``hypercube``: the one-shuffle Shares grid with a per-cell pandas
    merge — pays Python per cell but never materializes R⋈S, so it
    wins exactly when the intermediate explodes (dense graphs, heavy
    hub keys beyond what AQE skew-splitting absorbs).
    """
    if strategy == "chain":
        return chain_triangle_join(r, s, t)
    if strategy == "hypercube":
        return hypercube_triangle_join(r, s, t, grid)
    raise ValueError(f"unknown triangle strategy: {strategy!r}")
