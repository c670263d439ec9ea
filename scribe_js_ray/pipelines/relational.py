"""Relational pipelines over the TPC-H-ish test tables.

Demonstrates the engine's wide-operator vocabulary as idiomatic Ray Data:
vectorized Arrow batch transforms, pre-projected groupbys (only the needed
columns cross the shuffle), broadcast hash joins for small sides (ray.put
pattern — no shuffle join), per-batch top-k before a final small sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: filter by ship date, group by flag+status.
    Pruned read: 7 of 11 columns; partial sums happen inside the groupby's
    map-side combine (Ray Data aggregate)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc_price)
        t = t.append_column("charge", charge)
        return t.select(["l_returnflag", "l_linestatus", "l_quantity",
                         "l_extendedprice", "disc_price", "charge",
                         "l_discount"])

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_extendedprice", alias_name="avg_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    return out.sort(["l_returnflag", "l_linestatus"])


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                       AS sum_qty,
       sum(l_extendedprice)                                  AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity)                                       AS avg_qty,
       avg(l_extendedprice)                                  AS avg_price,
       avg(l_discount)                                       AS avg_disc,
       count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_revenue_orders(sf_dir: str, k: int = 10):
    """Revenue per order → top-k: groupby partial-combines, then one small
    sort over the aggregated result (never the raw rows)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    agg = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("revenue", alias_name="revenue"))
    return agg.sort(["revenue", "l_orderkey"], descending=[True, False]) \
        .limit(k)


TOP_REVENUE_SQL = """
SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def orders_by_nation(sf_dir: str):
    """Order counts + totals per customer nation: broadcast the small
    customer→nation mapping into every batch (dict in task closure at this
    scale; ray.put of the Arrow table at cluster scale) — no shuffle join."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nat_name = dict(zip(nation["n_nationkey"].to_pylist(),
                        nation["n_name"].to_pylist()))
    cust_nation = {c: nat_name[n] for c, n in
                   zip(cust["c_custkey"].to_pylist(),
                       cust["c_nationkey"].to_pylist())}

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        names = [cust_nation.get(c) for c in t["o_custkey"].to_pylist()]
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "o_totalprice": t["o_totalprice"],
        })

    out = ds.map_batches(attach, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="total_price"))
    return out.sort("n_name")


ORDERS_BY_NATION_SQL = """
SELECT n_name, count(*) AS n_orders, sum(o_totalprice) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def events_daily(sf_dir: str):
    """Windowed aggregate: events per type per day (timestamp truncation
    inside the batch, then a pre-projected groupby)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        return pa.table({"day": day, "event_type": t["event_type"],
                         "value": t["value"]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))
    return out.sort(["event_type", "day"])


EVENTS_DAILY_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n_events, sum(value) AS sum_value
FROM events
GROUP BY event_type, day
ORDER BY event_type, day
"""


def high_value_orders(sf_dir: str):
    """Vectorized filter + projection (predicate inside map_batches beats a
    row filter; the read prunes to 4 columns)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice",
                                  "o_orderstatus"])

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.greater(t["o_totalprice"], pa.scalar(200000.0)),
            pc.equal(t["o_orderstatus"], pa.scalar("O"))))

    return ds.map_batches(f, batch_format="pyarrow") \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])


HIGH_VALUE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_totalprice > 200000.0 AND o_orderstatus = 'O'
ORDER BY o_totalprice DESC, o_orderkey
"""


def part_size_stats(sf_dir: str):
    """Groupby over a dimension table: count + min/max retail price by size."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_size", "p_retailprice"])
    out = ds.groupby("p_size").aggregate(
        Count(alias_name="n_parts"),
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"))
    return out.sort("p_size")


PART_SIZE_SQL = """
SELECT p_size, count(*) AS n_parts,
       min(p_retailprice) AS min_price, max(p_retailprice) AS max_price
FROM part
GROUP BY p_size
ORDER BY p_size
"""
