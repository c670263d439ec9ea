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


def _fact_blocks(sf_dir: str, *files: str) -> int:
    """Read block count for fact tables: one block per ~64 MB of
    (decompressed-estimate) input, floored at cluster CPUs — the same
    sizing as the join buckets (functions/joins.py buckets_for_bytes).
    Ray's sort-based groupby shuffle cost scales with input blocks, so
    oversplitting a small read directly slows the exchange (measured on
    regional_revenue: 128 blocks 12.7 s → 32 blocks 2.1 s at sf0.1)."""
    import os

    from ..functions.joins import buckets_for_bytes
    total = sum(os.path.getsize(f"{sf_dir}/{f}") for f in files)
    return buckets_for_bytes(3 * total)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: filter by ship date, group by flag+status.
    Pruned read: 7 of 11 columns; partial sums happen inside the groupby's
    map-side combine (Ray Data aggregate).

    The money columns are exact multiples of 0.01, so all sums are done in
    scaled int64 (cents / cents² / cents³) — exact, order-independent, and
    therefore bit-identical to the oracle's DECIMAL aggregation regardless
    of Ray's block/summation order (r1 hash_match was off by ~1 ulp from
    float summation order)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        override_num_blocks=_fact_blocks(sf_dir, "lineitem.parquet"))

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))
    i64 = pa.int64()

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = pc.cast(pc.round(t["l_quantity"]), i64)
        price_c = pc.cast(pc.round(
            pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), i64)
        disc_c = pc.cast(pc.round(
            pc.multiply(t["l_discount"], pa.scalar(100.0))), i64)
        tax_c = pc.cast(pc.round(
            pc.multiply(t["l_tax"], pa.scalar(100.0))), i64)
        disc_price_s4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, i64), disc_c))
        charge_s6 = pc.multiply(
            disc_price_s4, pc.add(pa.scalar(100, i64), tax_c))
        partial = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty, "price_c": price_c, "disc_c": disc_c,
            "disc_price_s4": disc_price_s4, "charge_s6": charge_s6,
            "n": pa.array(np.ones(len(qty), dtype=np.int64)),
        })
        # Map-side combine: collapse to one row per (flag,status) per batch
        # BEFORE the shuffle (6 groups total).
        g = partial.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_c", "sum"), ("disc_c", "sum"),
             ("disc_price_s4", "sum"), ("charge_s6", "sum"), ("n", "sum")])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price_c", "disc_c",
             "disc_price_s4", "charge_s6", "n"])

    agg = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(
            Sum("qty", alias_name="qty"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("disc_price_s4", alias_name="disc_price_s4"),
            Sum("charge_s6", alias_name="charge_s6"),
            Sum("n", alias_name="count_order"),
        )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["count_order"], pa.float64())
        sum_qty = pc.cast(t["qty"], pa.float64())
        sum_base = pc.divide(pc.cast(t["price_c"], pa.float64()),
                             pa.scalar(100.0))
        sum_disc_price = pc.divide(
            pc.cast(t["disc_price_s4"], pa.float64()), pa.scalar(1e4))
        sum_charge = pc.divide(
            pc.cast(t["charge_s6"], pa.float64()), pa.scalar(1e6))
        sum_disc = pc.divide(pc.cast(t["disc_c"], pa.float64()),
                             pa.scalar(100.0))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": sum_qty,
            "sum_base_price": sum_base,
            "sum_disc_price": sum_disc_price,
            "sum_charge": sum_charge,
            "avg_qty": pc.divide(sum_qty, n),
            "avg_price": pc.divide(sum_base, n),
            "avg_disc": pc.divide(sum_disc, n),
            "count_order": t["count_order"],
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["l_returnflag", "l_linestatus"])


# Oracle mirrors the exact-arithmetic contract: DECIMAL sums (exact), cast
# to DOUBLE only at the end, averages as double(sum)/count — the same
# correctly-rounded conversions the Ray side performs on its scaled int64
# sums, so values match bit-for-bit.
Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
           AS avg_disc,
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
                                  "l_discount"],
                         override_num_blocks=_fact_blocks(
                             sf_dir, "lineitem.parquet"))

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        partial = pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})
        # Map-side combine: lineitem is clustered by orderkey, so the
        # in-batch groupby collapses ~4 rows per key BEFORE the shuffle.
        return partial.group_by("l_orderkey").aggregate(
            [("revenue", "sum")]).rename_columns(["l_orderkey", "revenue"])

    agg = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("revenue", alias_name="revenue"))

    def block_topk(t: pa.Table) -> pa.Table:
        # Per-block top-k: the global sort then sees ≤ k rows per block
        # instead of every order (150k+ at sf0.1).
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k, sort_keys=[("revenue", "descending"),
                             ("l_orderkey", "ascending")])
        return t.take(idx)

    return agg.map_batches(block_topk, batch_format="pyarrow") \
        .sort(["revenue", "l_orderkey"], descending=[True, False]) \
        .limit(k)


TOP_REVENUE_SQL = """
SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def orders_by_nation(sf_dir: str):
    """Order counts + totals per customer nation: the small
    customer→nation mapping is a ``ray.put`` Arrow broadcast
    (BroadcastTable) — tasks fetch it zero-copy from their node's object
    store and map keys with vectorized ``pc.index_in``; nothing but an
    ObjectRef rides in the task closure, and there is no shuffle join."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import BroadcastTable

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    # pre-join nation names onto the customer keys driver-side (25-row
    # nation table), so the broadcast is a single (c_custkey, n_name) map
    idx = pc.index_in(cust["c_nationkey"], value_set=nation["n_nationkey"])
    bc = BroadcastTable(pa.table({
        "c_custkey": cust["c_custkey"],
        "n_name": pc.take(nation["n_name"], idx),
    }))

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": bc.lookup(t["o_custkey"], "c_custkey", "n_name"),
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


def events_user_hourly(sf_dir: str):
    """Tumbling-window aggregate + lag window function: per (user, hour)
    event count/value sum, plus the delta vs that user's previous active
    hour.  The hourly rollup is a pre-projected groupby (map-side
    combine); the lag runs per-user in ``map_groups`` after the same
    exchange — one shuffle keyed on user_id serves both steps."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"user_id": t["user_id"], "hour": hour,
                         "value": t["value"]})

    hourly = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["user_id", "hour"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"))

    def lag_delta(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("hour").reset_index(drop=True)
        df["delta_value"] = df["sum_value"] - \
            df["sum_value"].shift(1).fillna(0.0)
        return df

    out = hourly.groupby("user_id").map_groups(lag_delta,
                                               batch_format="pandas")
    return out.sort(["user_id", "hour"])


EVENTS_USER_HOURLY_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         count(*) AS n_events, sum(value) AS sum_value
  FROM events GROUP BY user_id, hour
)
SELECT user_id, hour, n_events, sum_value,
       sum_value - COALESCE(
           lag(sum_value) OVER (PARTITION BY user_id ORDER BY hour),
           0) AS delta_value
FROM hourly ORDER BY user_id, hour
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


def q3_shipping_priority(sf_dir: str, k: int = 10):
    """TPC-H Q3 analog: 3-way join via ONE shuffle join (orders ⋈ lineitem
    on orderkey) plus a broadcast semi-join for the small filtered customer
    side (segment filter first → the broadcast set is tiny), then a
    pre-projected groupby and a small top-k sort."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.joins import BroadcastTable

    seg_cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])
    # Broadcast semi-join side: ray.put the filtered key column once;
    # tasks read it zero-copy instead of pickling the set per task.
    bc_keep = BroadcastTable(seg_cust.filter(
        pc.equal(seg_cust["c_mktsegment"], pa.scalar("BUILDING"))
    ).select(["c_custkey"]))

    cutoff = pa.scalar(np.datetime64("1997-06-15", "us"))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        override_num_blocks=_fact_blocks(sf_dir, "orders.parquet"))

    def filter_orders(t: pa.Table) -> pa.Table:
        keep = bc_keep.get()["c_custkey"]
        mask_date = pc.less(t["o_orderdate"], cutoff)
        mask_cust = pc.is_in(t["o_custkey"],
                             value_set=keep.combine_chunks())
        return t.filter(pc.and_(mask_date, mask_cust)) \
            .select(["o_orderkey", "o_orderdate"])

    orders_f = orders.map_batches(filter_orders, batch_format="pyarrow")

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        override_num_blocks=_fact_blocks(sf_dir, "lineitem.parquet"))

    def prep_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    line_f = lineitem.map_batches(prep_lineitem, batch_format="pyarrow")

    joined = line_f.join(orders_f, join_type="inner", num_partitions=16,
                         on=("l_orderkey",), right_on=("o_orderkey",))
    agg = joined.groupby(["l_orderkey", "o_orderdate"]) \
        .aggregate(Sum("revenue", alias_name="revenue"))
    return agg.sort(["revenue", "l_orderkey"],
                    descending=[True, False]).limit(k) \
        .select_columns(["l_orderkey", "o_orderdate", "revenue"])


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate > TIMESTAMP '1997-06-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Sessionization (streaming-window analog): per-user event streams
    split on >30-min inactivity gaps.  Shuffle key = user_id; each group
    sorts its own events (tiny) — the global sort is avoided."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def sessions_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(float("inf"))
        session_ids = (gaps > gap_minutes * 60).cumsum()
        out = g.groupby(session_ids).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("ts", "size"))
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(
        sessions_of_user, batch_format="pandas") \
        .sort(["user_id", "session_start"])


EVENTS_SESSIONIZE_SQL = """
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
) GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def events_asof_purchase(sf_dir: str):
    """As-of join WITHIN the events stream: for every click, the same
    user's most recent purchase at-or-before it.  Custom operator (Ray
    Data has no asof join): co-partition both sides by user via ONE
    groupby shuffle, then a per-group sorted merge (searchsorted) — the
    documented partitioning assumption is user_id co-location."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def relevant(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        return t.filter(mask)

    both = ds.map_batches(relevant, batch_format="pyarrow")

    def asof_of_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values("ts")
        purchases = g[g["event_type"] == "purchase"].sort_values("ts")
        if clicks.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "last_purchase_ts": pd.Series([], dtype="datetime64[us]"),
            })
        idx = purchases["ts"].searchsorted(clicks["ts"], side="right") - 1
        last_ts = [
            purchases["ts"].iloc[i] if i >= 0 else pd.NaT for i in idx]
        return pd.DataFrame({
            "event_id": clicks["event_id"].to_numpy(),
            "user_id": clicks["user_id"].to_numpy(),
            "last_purchase_ts": pd.Series(last_ts,
                                          dtype="datetime64[us]"),
        })

    return both.groupby("user_id").map_groups(
        asof_of_user, batch_format="pandas").sort("event_id")


EVENTS_ASOF_SQL = """
SELECT c.event_id, c.user_id, p.ts AS last_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def nation_top_customers(sf_dir: str, k: int = 3):
    """Top-k per group (window-function analog): total order value per
    customer, then the top 3 customers per nation.  Per-group top-k via
    map_groups after ONE groupby shuffle; no global sort of customers."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.joins import BroadcastTable

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    # customer→nation is the broadcast side: ray.put once, zero-copy in
    # every task, vectorized pc.index_in lookup (no per-task dict pickle)
    bc = BroadcastTable(cust)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"))

    def attach_nation(t: pa.Table) -> pa.Table:
        nk = pc.fill_null(pc.cast(
            bc.lookup(t["o_custkey"], "c_custkey", "c_nationkey"),
            pa.int64()), pa.scalar(-1, pa.int64()))
        return t.append_column("n_nationkey", nk)

    with_nation = per_cust.map_batches(attach_nation, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["total_spent", "o_custkey"],
                             ascending=[False, True]).head(k)

    return with_nation.groupby("n_nationkey").map_groups(
        topk, batch_format="pandas") \
        .sort(["n_nationkey", "total_spent", "o_custkey"],
              descending=[False, True, False])


NATION_TOP_CUSTOMERS_SQL = """
SELECT o_custkey, total_spent, n_nationkey
FROM (
    SELECT o_custkey, sum(o_totalprice) AS total_spent,
           c_nationkey AS n_nationkey,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY sum(o_totalprice) DESC,
                                       o_custkey) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_custkey, c_nationkey
)
WHERE rn <= 3
ORDER BY n_nationkey, total_spent DESC, o_custkey
"""


def events_distinct_users(sf_dir: str):
    """Distributed exact distinct-count: per-batch dedup collapses the
    stream BEFORE the exchange (the partial/combiner rule), then one
    groupby over the surviving keys and a driver-side count of a
    key-only dataset.  The shuffle moves at most one row per distinct
    key per block — never the raw events."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def batch_unique(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(
            t["user_id"].combine_chunks())})

    uniq = ds.map_batches(batch_unique, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Count(alias_name="_n"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({"n_users": pa.array([t.num_rows], pa.int64())})

    # per-block counts → one tiny sum (never materializes the keys)
    counts = uniq.map_batches(finalize, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    out = counts.aggregate(Sum("n_users", alias_name="n_users"))
    import pandas as pd
    # empty input: Dataset.aggregate returns None; the oracle still
    # emits one n_users=0 row
    n = out["n_users"] if out else 0
    return pd.DataFrame({"n_users": [n]})


EVENTS_DISTINCT_SQL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
"""


def events_running_total(sf_dir: str):
    """Windowed aggregate (custom operator — Ray Data has no window
    functions): per-user running total of event value in event-time
    order.  Shuffle key = user_id; each group sorts + cumsums its own
    stream.  Sums run in scaled int64 cents so the result is bit-exact
    vs the oracle's window SUM regardless of its aggregation tree."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def running_of_user(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        g = g.sort_values(["ts", "event_id"])
        # DuckDB round() is half-AWAY-from-zero; pandas .round() is
        # half-to-even — diverges whenever value*100 lands exactly on .5
        # in float.  Emulate half-away explicitly.
        v = g["value"].to_numpy() * 100.0
        cents = pd.Series(
            (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64"),
            index=g.index)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "running_value": (cents.cumsum() / 100.0).to_numpy(),
        })

    return ds.groupby("user_id").map_groups(
        running_of_user, batch_format="pandas") \
        .sort(["user_id", "event_id"])


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
           AS running_value
FROM events
ORDER BY user_id, event_id
"""


def regional_revenue(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5-style multi-join: revenue per nation for customers in one
    region.  ONE all-to-all exchange total: lineitem revenue partials and
    orders are bucketed by hash(orderkey) in the same union+groupby, and
    each bucket task aggregates its lineitem rows per order, maps
    orderkey→custkey (1:1 within the bucket), folds custkey→nation
    through a ray.put Arrow broadcast, and emits a ≤|nations|-row
    partial — the final groupby runs over ≤25 nation names.  The
    separate per-order groupby + join (two exchanges) this replaces
    measured 3× slower at sf0.1.  Revenue sums in int64 cents² →
    bit-exact vs the DECIMAL oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.joins import BroadcastTable, buckets_for_bytes

    # Broadcast side: custkey → nation NAME for nations in the region
    # (region ⋈ nation folded driver-side: 5 × 25 rows; customer is the
    # classic TPC-H small side — broadcast, never shuffled).
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    region_keys = {k for k, n in zip(reg["r_regionkey"].to_pylist(),
                                     reg["r_name"].to_pylist())
                   if n == region}
    keep_mask = pc.is_in(
        nation["n_regionkey"],
        value_set=pa.array(sorted(region_keys), nation["n_regionkey"].type))
    nation_in_region = nation.filter(keep_mask)
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nidx = pc.index_in(customer["c_nationkey"],
                       value_set=nation_in_region["n_nationkey"])
    cust_nation = pa.table({
        "c_custkey": customer["c_custkey"],
        # null for customers outside the region → dropped in-batch
        "n_name": pc.take(nation_in_region["n_name"], nidx),
    })
    bc = BroadcastTable(cust_nation)

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        part = pa.table({"l_orderkey": t["l_orderkey"], "rev_s4": rev})
        return part.group_by("l_orderkey").aggregate(
            [("rev_s4", "sum")]).rename_columns(["l_orderkey", "rev_s4"])

    # Bucket count sized from the compressed fact-table bytes on disk
    # (×3 decompression estimate) — bounds per-bucket memory as data
    # grows while flooring at cluster CPUs (functions/joins.py).  The
    # reads use the SAME block count: Ray's sort-based groupby shuffle
    # costs O(input_blocks × partitions) in scheduling, and measured
    # 12.7 s → 2.1 s at sf0.1 when blocks dropped 128 → 32.
    import os
    fact_bytes = 3 * (os.path.getsize(f"{sf_dir}/lineitem.parquet")
                      + os.path.getsize(f"{sf_dir}/orders.parquet"))
    n_buckets = buckets_for_bytes(fact_bytes)

    from ..functions.joins import bucket_of

    def tag_li(t: pa.Table) -> pa.Table:
        part = li_partial(t)
        keys = np.asarray(part["l_orderkey"], dtype=np.int64)
        return pa.table({
            "l_orderkey": part["l_orderkey"],
            "rev_s4": part["rev_s4"],
            "o_custkey": pa.nulls(part.num_rows, pa.int64()),
            "__b": pa.array(bucket_of(keys, n_buckets)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["o_orderkey"], dtype=np.int64)
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "rev_s4": pa.nulls(t.num_rows, pa.int64()),
            "o_custkey": t["o_custkey"],
            "__b": pa.array(bucket_of(keys, n_buckets)),
        })

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=n_buckets)
    li_tagged = lineitem.map_batches(tag_li, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"],
                             override_num_blocks=n_buckets) \
        .map_batches(tag_orders, batch_format="pyarrow")

    def bucket_fold(t: pa.Table) -> pa.Table:
        # One bucket = all lineitem partials + all orders for a slice of
        # orderkey space.  Aggregate per order, map 1:1 to custkey, fold
        # to nation via the broadcast — all Arrow kernels.
        is_ord = pc.is_valid(t["o_custkey"])
        li = t.filter(pc.invert(is_ord))
        ords = t.filter(is_ord)
        rev = li.select(["l_orderkey", "rev_s4"]) \
            .group_by("l_orderkey").aggregate([("rev_s4", "sum")]) \
            .rename_columns(["l_orderkey", "rev_s4"])
        oidx = pc.index_in(rev["l_orderkey"], value_set=ords["l_orderkey"])
        cust = pc.take(ords["o_custkey"], oidx)
        names = bc.lookup(cust, "c_custkey", "n_name")
        part = pa.table({"n_name": names, "rev_s4": rev["rev_s4"]}) \
            .filter(pc.is_valid(names))
        return part.group_by("n_name").aggregate(
            [("rev_s4", "sum")]).rename_columns(["n_name", "rev_s4"])

    agg = li_tagged.union(orders).groupby("__b") \
        .map_groups(bucket_fold, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("rev_s4", alias_name="rev_s4"))

    def finish(t: pa.Table) -> pa.Table:
        rev = pc.divide(pc.cast(t["rev_s4"], pa.float64()),
                        pa.scalar(1e4))
        return pa.table({"n_name": t["n_name"], "revenue": rev})

    return agg.map_batches(finish, batch_format="pyarrow").sort("n_name")


REGIONAL_REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY n_name
"""


def events_window_join(sf_dir: str):
    """Interval (range) join: events × 24 OVERLAPPING 48-hour campaign
    windows starting every 36 hours from 2024-01-01 — an event can land
    in two windows, so this is a true range join, not a bucketing.

    Scale shape: the window table is tiny and ships once per worker
    (closure constant here; ray.put for a dynamic window list), the fact
    table streams, and each batch emits PARTIAL (window, event_type)
    aggregates — the exchange only ever carries
    n_windows × n_types × n_blocks rows.  For a window table too large
    to broadcast, bucket both sides by coarse time range instead (same
    pattern as the hash-bucket join in functions/joins.py)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    base_us = np.datetime64("2024-01-01", "us").astype("int64")
    hour_us = 3_600_000_000
    starts = base_us + np.arange(24, dtype="int64") * 36 * hour_us
    ends = starts + 48 * hour_us

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("int64")
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        # half-away-from-zero cents like the money queries (bit-exact
        # int64 sums; float64 += is order-dependent across blocks)
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype("int64")
        wins, types, ns, sums = [], [], [], []
        for w in range(len(starts)):
            in_win = (ts >= starts[w]) & (ts < ends[w])
            if not in_win.any():
                continue
            et = etype[in_win]
            cs = cents[in_win]
            for ty in np.unique(et):
                m = et == ty
                wins.append(w)
                types.append(str(ty))
                ns.append(int(m.sum()))
                sums.append(int(cs[m].sum()))
        return pa.table({
            "window_id": pa.array(wins, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(ns, pa.int64()),
            "sum_value_c": pa.array(sums, pa.int64()),
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_id", "event_type"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_c", alias_name="sum_value_c"))
    return out.sort(["window_id", "event_type"])


EVENTS_WINDOW_JOIN_SQL = """
WITH windows AS (
    SELECT i AS window_id,
           TIMESTAMP '2024-01-01' + i * INTERVAL 36 HOUR AS w_start,
           TIMESTAMP '2024-01-01' + i * INTERVAL 36 HOUR
               + INTERVAL 48 HOUR AS w_end
    FROM generate_series(0, 23) AS t(i)
)
SELECT w.window_id, e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_value_c
FROM events e
JOIN windows w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w.window_id, e.event_type
ORDER BY w.window_id, e.event_type
"""


def events_distinct_users_hll(sf_dir: str, p: int = 12):
    """Approximate distinct-count via HyperLogLog (Flajolet et al. 2007,
    public algorithm): the answer the exact op above cannot give at
    10^12 rows without shuffling every surviving key.

    Shape: each block reduces to ONE 2^p-byte register row map-side
    (vectorized numpy: splitmix64 avalanche hash of the int64 key, top
    p bits pick the register, rho = leading-zero rank of the rest);
    the whole-dataset aggregate then elementwise-maxes the register
    vectors — total exchange traffic is n_blocks × 4 KiB, independent
    of cardinality.  Standard alpha_m bias correction + linear-counting
    small-range fix.  ~0.8% standard error at p=12 (rows-only check;
    tests assert <3% vs the exact op)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    m = 1 << p

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def block_registers(t: pa.Table) -> pa.Table:
        x = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        # splitmix64 finalizer (public domain) — vectorized avalanche
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        bucket = (x >> np.uint64(64 - p)).astype(np.int64)
        rest = x << np.uint64(p)  # top 64-p payload bits, left-aligned
        # rho = leading zeros of payload + 1 (capped at 64-p+1)
        rho = np.full(len(x), 64 - p + 1, np.uint8)
        nz = rest != 0
        # count leading zeros via float64 exponent trick is lossy;
        # do it in log2 steps on the integer instead
        r = rest[nz]
        lz = np.zeros(r.shape, np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += np.uint8(shift)
            r[mask] = r[mask] << np.uint64(shift)
        rho[nz] = lz + 1
        regs = np.zeros(m, np.uint8)
        np.maximum.at(regs, bucket, rho)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.large_binary())})

    def _acc(a, row):
        b = np.frombuffer(row["regs"], np.uint8)
        return np.maximum(np.frombuffer(a, np.uint8), b).tobytes()

    blocks = ds.map_batches(block_registers, batch_format="pyarrow",
                            batch_size=None)
    merged = blocks.aggregate(AggregateFn(
        init=lambda k: bytes(m),
        accumulate_row=_acc,
        merge=lambda a, b: np.maximum(np.frombuffer(a, np.uint8),
                                      np.frombuffer(b, np.uint8))
        .tobytes(),
        name="regs"))

    regs = np.frombuffer(merged["regs"], np.uint8) if merged \
        else np.zeros(m, np.uint8)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return pd.DataFrame({"n_users_hll": [int(round(est))]})


def events_retention(sf_dir: str):
    """Cohort retention: cohort = a user's first active day; one row per
    (cohort_day, day_offset) counting users active that many days after
    joining — the classic activation/retention matrix.

    Distributed shape: (user_id, day) pairs are deduplicated MAP-SIDE
    (per-batch Arrow group_by) before the one user-keyed exchange; the
    per-user group derives its own cohort (min day) and emits its
    distinct offsets, so the second groupby counts one row per
    (user, offset) — Count() IS distinct users.  Neither exchange ever
    carries more than the deduplicated (user, day) pairs."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        pairs = pa.table({"user_id": t["user_id"], "day": day})
        return pairs.group_by(["user_id", "day"]).aggregate([])

    def offsets(g: pd.DataFrame) -> pa.Table:
        days = g["day"].drop_duplicates().sort_values()
        cohort = days.iloc[0]
        off = ((days - cohort).dt.days).astype("int64")
        # return Arrow with explicit us timestamps: a pandas return
        # upcasts to ns and the hash-compare sees a dtype mismatch
        return pa.table({
            "cohort_day": pa.array([cohort] * len(days),
                                   pa.timestamp("us")),
            "day_offset": pa.array(off.to_numpy(), pa.int64()),
        })

    pairs = ds.map_batches(prep, batch_format="pyarrow")
    per_user = pairs.groupby("user_id").map_groups(offsets,
                                                   batch_format="pandas")
    out = per_user.groupby(["cohort_day", "day_offset"]) \
        .aggregate(Count(alias_name="n_users")) \
        .sort(["cohort_day", "day_offset"])

    def cast_us(t: pa.Table) -> pa.Table:
        # midnight-aligned days round-trip through a numpy 'D'-precision
        # array inside the groupby machinery and come back timestamp[s];
        # pin the oracle-facing dtype (date_trunc emits us)
        i = t.schema.get_field_index("cohort_day")
        return t.set_column(i, "cohort_day",
                            pc.cast(t["cohort_day"], pa.timestamp("us")))

    return out.map_batches(cast_us, batch_format="pyarrow")


EVENTS_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), coh AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT coh.cohort_day,
       CAST(date_diff('day', coh.cohort_day, ud.day) AS BIGINT)
           AS day_offset,
       count(*) AS n_users
FROM ud JOIN coh USING (user_id)
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


def events_funnel(sf_dir: str,
                  steps: tuple[str, ...] = ("signup", "click", "purchase")):
    """Ordered n-step funnel (web-analytics staple): for each step k,
    how many users completed steps 1..k IN ORDER — earliest-completion
    semantics (step k's timestamp is the user's first event of that
    type STRICTLY AFTER step k-1's timestamp).

    Distributed shape: events are filtered to the funnel's event types
    map-side, so the single user-keyed exchange carries only
    (user_id, ts, event_type) for those types; each per-user group runs
    the earliest-completion scan over its own (tiny) event list; a
    final step-keyed Count over one row per (user, completed step) is
    the funnel.  No global sort, no all-pairs."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    step_list = list(steps)
    value_set = pa.array(step_list)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def relevant(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=value_set))

    def steps_of_user(g: pd.DataFrame) -> pa.Table:
        reached = 0
        prev = None
        for s in step_list:
            ts = g.loc[g["event_type"] == s, "ts"]
            if prev is not None:
                ts = ts[ts > prev]
            if ts.empty:
                break
            prev = ts.min()
            reached += 1
        # typed Arrow return: an empty pandas frame would emit a
        # schema-less block and trip the executor's schema warning
        return pa.table({"step": pa.array(range(1, reached + 1),
                                          pa.int64())})

    names = pa.array(step_list, pa.string())

    def attach_names(t: pa.Table) -> pa.Table:
        idx = pc.cast(pc.subtract(t["step"], 1), pa.int64())
        return pa.table({
            "step": pc.cast(t["step"], pa.int64()),
            "step_name": pc.take(names, idx),
            "n_users": pc.cast(t["n_users"], pa.int64()),
        })

    per_user = ds.map_batches(relevant, batch_format="pyarrow") \
        .groupby("user_id").map_groups(steps_of_user,
                                       batch_format="pandas")
    return per_user.groupby("step") \
        .aggregate(Count(alias_name="n_users")) \
        .map_batches(attach_names, batch_format="pyarrow") \
        .sort("step")


# Oracle twin: iterated earliest-completion semi-joins.  Steps nobody
# reached are filtered on BOTH sides (the Ray groupby emits no row for
# an empty step; the WHERE keeps the SQL identical).
EVENTS_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
         count(*) AS n_users FROM s1
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3
) WHERE n_users > 0 ORDER BY step
"""


def part_price_quantiles(sf_dir: str,
                         qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)):
    """Grouped EXACT discrete quantiles of part retail price per brand
    (DuckDB ``quantile_disc`` parity: the element at index
    ``ceil(q*n) - 1`` of the sorted group — rule pinned empirically
    against DuckDB for n = 4, 5, 6, 9).

    Distributed shape: prices are projected to int64 cents MAP-SIDE
    (``floor(x*100 + 0.5)``, the repo's standard float-free hashing
    projection), so the one brand-keyed exchange carries two small
    columns; per-group numpy sort (groups are per-brand slices, never
    the table).  Exact grouped quantiles genuinely need the group's
    values co-located — this is the documented partitioning assumption;
    for sketched quantiles at extreme group cardinality see the
    HyperLogLog pattern (events_distinct_users_hll)."""
    import math

    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_retailprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["p_retailprice"], 100.0), 0.5)), pa.int64())
        return pa.table({"p_brand": t["p_brand"], "cents": cents})

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["cents"].to_numpy())
        n = len(v)
        row: dict[str, list] = {"p_brand": [g["p_brand"].iloc[0]],
                                "n_parts": pd.Series([n], dtype="int64")}
        for q in qs:
            idx = max(int(math.ceil(q * n)) - 1, 0)
            row[f"p{int(q * 100)}"] = pd.Series([int(v[idx])],
                                                dtype="int64")
        return pd.DataFrame(row)

    return ds.map_batches(to_cents, batch_format="pyarrow") \
        .groupby("p_brand").map_groups(quants, batch_format="pandas") \
        .sort("p_brand")


PART_PRICE_QUANTILES_SQL = """
WITH c AS (
  SELECT p_brand,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
)
SELECT p_brand, count(*) AS n_parts,
       quantile_disc(cents, 0.25) AS p25,
       quantile_disc(cents, 0.50) AS p50,
       quantile_disc(cents, 0.75) AS p75,
       quantile_disc(cents, 0.90) AS p90
FROM c GROUP BY p_brand ORDER BY p_brand
"""


def customers_no_big_order(sf_dir: str, threshold: float = 300_000.0,
                           broadcast_cap: int = 5_000_000):
    """Distributed ANTI JOIN: customers with no order above ``threshold``.

    Scale shape: the orders stream is filtered AND deduplicated map-side
    (per-batch unique on o_custkey) before its one groupby exchange, so
    the exchange carries at most |customers-with-a-big-order| rows, not
    |orders|.  The distinct buyer keyset — bounded by |customer| — then
    broadcasts via ray.put and anti-filters the customer stream with
    vectorized ``pc.is_in``; above ``broadcast_cap`` buyers the same
    hash-bucket left-join + null-filter fallback as
    corpus.dedup_keep_list takes over (documented cap, no silent
    driver blowup)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..functions.joins import BroadcastTable, hash_bucket_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def big_buyers(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater(t["o_totalprice"], threshold))
        keys = pc.unique(hit["o_custkey"])
        return pa.table({"o_custkey": keys})

    buyers = orders.map_batches(big_buyers, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Count(alias_name="n")) \
        .select_columns(["o_custkey"]).materialize()

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])

    if buyers.count() <= broadcast_cap:
        parts = list(buyers.iter_batches(batch_format="pyarrow"))
        key_tbl = pa.concat_tables(parts) if parts else \
            pa.table({"o_custkey": pa.array([], pa.int64())})
        bc = BroadcastTable(key_tbl)

        def anti(t: pa.Table) -> pa.Table:
            mask = pc.is_in(
                pc.cast(t["c_custkey"], pa.int64()),
                value_set=pc.cast(bc.get()["o_custkey"].combine_chunks(),
                                  pa.int64()))
            return t.filter(pc.invert(mask))

        out = cust.map_batches(anti, batch_format="pyarrow")
        return out.sort("c_custkey")

    tagged = buyers.map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"],
                            "__hit": pa.array([True] * t.num_rows)}),
        batch_format="pyarrow")
    joined = hash_bucket_join(cust, tagged, on="c_custkey", how="left")

    def strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["__hit"])).drop_columns(["__hit"])

    return joined.map_batches(strip, batch_format="pyarrow") \
        .sort("c_custkey")


CUSTOMERS_NO_BIG_ORDER_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey
"""


def events_user_mode(sf_dir: str):
    """Distributed MODE: each user's most frequent event type, ties to
    the lexicographically smallest type.

    Shape: stage 1 pre-aggregates (user, type) counts map-side per batch
    (the combiner rule — the exchange carries at most |users|×|types|
    rows); stage 2 groups by (user_id, event_type) for exact counts;
    stage 3 is a user-keyed argmax via ``map_groups`` with the
    deterministic (n DESC, event_type ASC) tie-break.  No global sort of
    events anywhere; event payload columns never leave the read."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        return pa.table({
            "user_id": g["user_id"],
            "event_type": g["event_type"],
            "n_part": _pc.cast(g["event_type_count"], pa.int64()),
        })

    counts = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]) \
        .aggregate(Sum("n_part", alias_name="n"))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True]).head(1)
        return g[["user_id", "event_type", "n"]]

    return counts.groupby("user_id") \
        .map_groups(argmax, batch_format="pandas") \
        .sort("user_id")


EVENTS_USER_MODE_SQL = """
SELECT user_id, event_type, n
FROM (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY count(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type
)
WHERE rn = 1
ORDER BY user_id
"""
