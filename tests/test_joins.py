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
