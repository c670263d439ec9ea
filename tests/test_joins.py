"""hash_bucket_join (functions/joins.py): the repartition join primitive."""

import numpy as np
import pyarrow as pa

from scribe_js_ray.functions.joins import hash_bucket_join


def _ds(table):
    import ray.data as rd
    return rd.from_arrow(table)


def test_inner_join_matches_pandas(ray_session):
    rng = np.random.RandomState(5)
    lk = rng.randint(0, 200, 500).astype("int64")
    rk = rng.randint(0, 200, 300).astype("int64")
    left = pa.table({"k": lk, "lv": np.arange(500, dtype="int64")})
    right = pa.table({"k": rk, "rv": np.arange(300, dtype="int64") * 10})
    got = hash_bucket_join(_ds(left), _ds(right), on="k", n_buckets=8) \
        .to_pandas().sort_values(["k", "lv", "rv"], ignore_index=True)
    import pandas as pd
    want = pd.merge(left.to_pandas(), right.to_pandas(), on="k") \
        .sort_values(["k", "lv", "rv"], ignore_index=True)
    assert len(got) == len(want)
    assert (got[["k", "lv", "rv"]].to_numpy()
            == want[["k", "lv", "rv"]].to_numpy()).all()


def test_join_empty_buckets_keep_schema(ray_session):
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "lv": pa.array([10, 20], pa.int64())})
    right = pa.table({"k": pa.array([2, 3], pa.int64()),
                      "rv": pa.array([200, 300], pa.int64())})
    out = hash_bucket_join(_ds(left), _ds(right), on="k", n_buckets=16) \
        .to_pandas()
    assert list(out["k"]) == [2]
    assert str(out["lv"].dtype) == "int64"
    assert str(out["rv"].dtype) == "int64"


def test_column_collision_rejected(ray_session):
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    import pytest
    with pytest.raises(ValueError):
        hash_bucket_join(_ds(t), _ds(t), on="k")


def test_large_int64_survive_exactly(ray_session):
    # ids above 2^53 must not round-trip through float64 (review r2)
    big = 2 ** 60 + 12345
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "lv": pa.array([big, big + 1], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "rv": pa.array([big + 2, big + 3], pa.int64())})
    out = hash_bucket_join(_ds(left), _ds(right), on="k") \
        .to_pandas().sort_values("k", ignore_index=True)
    assert list(out["lv"]) == [big, big + 1]
    assert list(out["rv"]) == [big + 2, big + 3]


def test_salted_join_matches_pandas(ray_session):
    # One hot key (0) dominating the left side; salt=4 must spread it
    # across sub-buckets while preserving exact inner-join semantics.
    rng = np.random.RandomState(11)
    lk = np.where(rng.rand(600) < 0.6, 0,
                  rng.randint(1, 50, 600)).astype("int64")
    rk = np.arange(50, dtype="int64")
    left = pa.table({"k": lk, "lv": np.arange(600, dtype="int64")})
    right = pa.table({"k": rk, "rv": rk * 7})
    got = hash_bucket_join(_ds(left), _ds(right), on="k",
                           n_buckets=8, salt=4) \
        .to_pandas().sort_values(["k", "lv"], ignore_index=True)
    import pandas as pd
    want = pd.merge(left.to_pandas(), right.to_pandas(), on="k") \
        .sort_values(["k", "lv"], ignore_index=True)
    assert len(got) == len(want)
    assert (got[["k", "lv", "rv"]].to_numpy()
            == want[["k", "lv", "rv"]].to_numpy()).all()


def test_salted_left_join_no_duplicates(ray_session):
    left = pa.table({"k": pa.array([1, 1, 1, 9], pa.int64()),
                     "lv": pa.array([10, 11, 12, 13], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "rv": pa.array([100], pa.int64())})
    out = hash_bucket_join(_ds(left), _ds(right), on="k",
                           n_buckets=4, how="left", salt=3) \
        .to_pandas().sort_values("lv", ignore_index=True)
    # every left row exactly once; unmatched key 9 null-padded once
    assert list(out["lv"]) == [10, 11, 12, 13]
    assert out["rv"].isna().tolist() == [False, False, False, True]


def test_salted_outer_join_rejected(ray_session):
    import pytest
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    u = pa.table({"k": pa.array([1], pa.int64()),
                  "w": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        hash_bucket_join(_ds(t), _ds(u), on="k", salt=2, how="outer")


def test_buckets_for_bytes_scales():
    from scribe_js_ray.functions.joins import buckets_for_bytes
    small = buckets_for_bytes(1 << 20)          # 1 MB
    big = buckets_for_bytes(1 << 40)            # 1 TB
    assert small >= 16
    assert big == 4096                          # hits the cap
    assert buckets_for_bytes(100 << 30) == 1600  # 100 GiB / 64 MiB


def test_broadcast_table_lookup(ray_session):
    from scribe_js_ray.functions.joins import BroadcastTable
    bc = BroadcastTable(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"], pa.string()),
    }))
    vals = bc.lookup(pa.chunked_array([pa.array([3, 1, 99], pa.int64())]),
                     "k", "name")
    assert vals.to_pylist() == ["c", "a", None]
