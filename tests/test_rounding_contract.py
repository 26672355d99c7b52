"""Pin the cross-engine rounding semantics every determinism snap in
the repo relies on (found the hard way at sf0.1 — 0588de1):

1. round-to-INTEGER on doubles is half-AWAY-FROM-ZERO in BOTH Spark
   and DuckDB → integer ties are safe, which is why grid snaps use
   `cast(round(x * scale) as bigint)`.
2. SCALED round (round(x, n>0)) on doubles DIVERGES between engines:
   Spark rounds the SHORTEST-DECIMAL string of the double (BigDecimal
   .valueOf path — double(333/640) prints as "0.5203125" and HALF_UP
   gives .520313), while DuckDB rounds the scaled PRODUCT
   (0.5203125 * 1e6 = 520312.4999…94 → .520312). No operator may use
   round(x, n) on a value that can land near a boundary.
3. The integer-snap `cast(round(x*scale) as bigint)/scale` forces both
   engines down the identical scaled-product path, so they agree.
"""

from __future__ import annotations

import duckdb

# double(333/640) — the percent_rank-shaped rational that exposed the
# divergence: shortest repr "0.5203125", scaled product 520312.4999…
TIE_EXPR = "CAST(333 AS DOUBLE) / 640"


def test_integer_round_is_half_away_in_both_engines(spark):
    q = (
        "SELECT round(CAST(0.5 AS DOUBLE)), round(CAST(2.5 AS DOUBLE)),"
        " round(CAST(-2.5 AS DOUBLE)), round(CAST(520312.5 AS DOUBLE))"
    )
    assert tuple(duckdb.sql(q).fetchone()) == (1.0, 3.0, -3.0, 520313.0)
    assert tuple(spark.sql(q).collect()[0]) == (1.0, 3.0, -3.0, 520313.0)


def test_scaled_round_divergence_is_still_present(spark):
    # if this starts agreeing, the engines changed their round(x, n)
    # implementations and the snap guidance notes can be revisited
    duck = duckdb.sql(f"SELECT round({TIE_EXPR}, 6)").fetchone()[0]
    sp = spark.sql(f"SELECT round({TIE_EXPR}, 6)").collect()[0][0]
    assert sp == 0.520313, "Spark rounds the shortest-decimal string"
    assert duck == 0.520312, "DuckDB rounds the scaled product"


def test_integer_snap_agrees_on_the_same_value(spark):
    expr = f"CAST(round(({TIE_EXPR}) * 1e6) AS BIGINT) / 1e6"
    duck = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    sp = spark.sql(f"SELECT {expr}").collect()[0][0]
    assert duck == sp == 0.520312


def test_grid_sum_snap_form_is_order_independent(spark):
    """Rule 3 (the bucketed_join_revenue fix): summing 4dp-grid products
    as DOUBLES then rounding at a coarser 2dp grid lets accumulation
    order pick the side of an exact x.xx5 boundary — Spark's partial-agg
    order differs from DuckDB's scan order, so the flake is cross-engine.
    The integer cents-4 accumulation is exact, hence order-independent."""
    # double addition is order-sensitive (ulp(1e16)=2 absorbs the 1.0
    # in one order and not the other)…
    vals = [1.0, 1e16, -1e16]
    assert sum(vals) != sum(reversed(vals))
    # …integer cents-4 accumulation is not, under ANY partitioning
    from pyspark.sql import functions as F

    rows = [(float(v),) for v in [2.675, 0.005, 1.115, 3.0, 0.0001] * 20]
    df = spark.createDataFrame(rows, "p double")
    form = "cast(sum(cast(round(p * 10000) as bigint)) as double) / 1e4"
    outs = {
        df.repartition(n).agg(F.expr(form).alias("r")).collect()[0]["r"]
        for n in (1, 3, 17)
    }
    assert len(outs) == 1
    # and the snap form is bit-identical across engines on the same rows
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE t (p DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v, in rows])
    duck = con.sql(
        "SELECT CAST(CAST(sum(CAST(round(p * 10000) AS BIGINT)) AS BIGINT)"
        " AS DOUBLE) / 1e4 FROM t"
    ).fetchone()[0]
    assert duck == outs.pop()
