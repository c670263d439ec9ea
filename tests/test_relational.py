

def test_hll_distinct_within_three_percent(ray_session):
    """HLL sketch (p=12, ~0.8% stderr) must track the exact distinct
    count; exchange traffic is one 4 KiB register row per block."""
    from scribe_js_ray.pipelines.relational import (
        events_distinct_users, events_distinct_users_hll)

    sf = "/root/testdata/sf0.001"
    exact = int(events_distinct_users(sf).n_users[0])
    hll = int(events_distinct_users_hll(sf).n_users_hll[0])
    assert abs(hll - exact) <= max(2, 0.03 * exact)
