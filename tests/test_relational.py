

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
