

def test_hll_distinct_within_three_percent(ray_session):
    """HLL sketch (p=12, ~0.8% stderr) must track the exact distinct
    count; exchange traffic is one 4 KiB register row per block."""
    from scribe_js_ray.pipelines.relational import (
        events_distinct_users, events_distinct_users_hll)

    sf = "/root/testdata/sf0.001"
    exact = int(events_distinct_users(sf).n_users[0])
    hll = int(events_distinct_users_hll(sf).n_users_hll[0])
    assert abs(hll - exact) <= max(2, 0.03 * exact)


def test_retention_cohort_semantics(ray_session):
    """Hand-checkable cohort matrix: every user appears at offset 0 of
    their own cohort; counts are distinct users, not events."""
    from scribe_js_ray.pipelines.relational import events_retention

    out = events_retention("/root/testdata/sf0.001").to_pandas()
    assert (out.day_offset >= 0).all()
    # offset-0 rows cover every user exactly once across cohorts
    import duckdb
    n_users = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert int(out[out.day_offset == 0].n_users.sum()) == n_users
    # monotone: a cohort's offset-d count never exceeds its offset-0
    day0 = out[out.day_offset == 0].set_index("cohort_day").n_users
    for _, row in out.iterrows():
        assert row.n_users <= day0[row.cohort_day]


def test_funnel_strict_order_semantics(ray_session, tmp_path):
    """Hand-built funnel edges: a pre-signup click does NOT count
    (strictly-after rule); a purchase before the click step does NOT
    complete step 3; users with no signup emit nothing."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scribe_js_ray.pipelines.relational import events_funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: full funnel in order
        (1, t(0), "signup"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: click BEFORE signup only -> stops after step 1
        (2, t(0), "click"), (2, t(1), "signup"),
        # user 3: purchase before its click; click later; no purchase
        # after the click -> stops after step 2
        (3, t(0), "signup"), (3, t(1), "purchase"), (3, t(2), "click"),
        # user 4: never signs up -> contributes to no step
        (4, t(0), "click"), (4, t(1), "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = events_funnel(str(tmp_path)).to_pandas()
    assert out.step.tolist() == [1, 2, 3]
    assert out.step_name.tolist() == ["signup", "click", "purchase"]
    assert out.n_users.tolist() == [3, 2, 1]


def test_part_price_quantiles_disc_rule(ray_session, tmp_path):
    """quantile_disc parity rule ceil(q*n)-1 on a hand-built group of
    n=9 prices 0.01..0.09 -> p25=3, p50=5, p75=7, p90=9 cents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scribe_js_ray.pipelines.relational import part_price_quantiles

    tbl = pa.table({
        "p_brand": pa.array(["B#1"] * 9, pa.string()),
        "p_retailprice": pa.array([i / 100 for i in range(1, 10)],
                                  pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "part.parquet")
    out = part_price_quantiles(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_parts, r.p25, r.p50, r.p75, r.p90) == (9, 3, 5, 7, 9)
