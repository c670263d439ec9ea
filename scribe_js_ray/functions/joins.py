"""Distributed joins for Ray Data (which has no native join in 2.49).

``hash_bucket_join`` — the repartition (shuffle) join: both sides are
tagged and bucketed by ``hash(key) % n_buckets``, ONE union+groupby
moves each bucket to one task, and each bucket joins with a vectorized
pandas merge.  n_buckets bounds per-task memory (bucket ≈ |L|+|R| over
n_buckets) and keeps the per-group Python overhead to n_buckets calls
instead of one per key.

Skew note: a hot key inflates one bucket; salt the key upstream (append
``key*K + salt`` replicas on the build side) when a key exceeds a
bucket's memory budget — the classic salted-join recipe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


def hash_bucket_join(left, right, on: str, n_buckets: int = 64,
                     how: str = "inner"):
    """Join two Datasets on an int64 key column; all other column names
    must be distinct between the sides (caller projects beforehand)."""

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = [c for c in l_schema.names if c != on]
    r_cols = [c for c in r_schema.names if c != on]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column collision across sides: {overlap}")
    # Unified schema: key + left cols + right cols (+ side/bucket); each
    # side pads the other's columns with typed nulls so union() sees one
    # schema.
    types = {}
    for name, typ in zip(l_schema.names, l_schema.types):
        types[name] = typ
    for name, typ in zip(r_schema.names, r_schema.types):
        types[name] = typ
    all_cols = [on] + l_cols + r_cols

    def tagger(side_id, own_cols):
        def tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            keys = np.asarray(t[on], dtype=np.int64)
            # Fibonacci-hash the key so consecutive ids spread across
            # buckets (plain modulo stripes clustered keys).
            h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            bucket = (h >> np.uint64(40)).astype(np.int64) % n_buckets
            cols = {}
            for c in all_cols:
                cols[c] = t[c] if c == on or c in own_cols \
                    else pa.nulls(n, types[c])
            cols[_BUCKET_COL] = pa.array(bucket, pa.int64())
            cols[_SIDE_COL] = pa.array(
                np.full(n, side_id, dtype=np.int8))
            return pa.table(cols)
        return tag

    lt = left.map_batches(tagger(0, set(l_cols)), batch_format="pyarrow")
    rt = right.map_batches(tagger(1, set(r_cols)), batch_format="pyarrow")

    def join_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        # Arrow-backed pandas dtypes: null-padded int64 columns stay
        # int64[pyarrow] through the merge (a numpy round-trip would
        # widen them to float64 and corrupt values above 2^53).
        g = t.to_pandas(types_mapper=pd.ArrowDtype)
        lg = g[g[_SIDE_COL] == 0]
        rg = g[g[_SIDE_COL] == 1]
        lg = lg[[on] + [c for c in l_cols if c in lg.columns]]
        rg = rg[[on] + [c for c in r_cols if c in rg.columns]]
        merged = pd.merge(lg, rg, on=on, how=how)
        out = pa.Table.from_pandas(merged, preserve_index=False)
        # Pin each column to its source-side type (outer-join nulls keep
        # the nullable Arrow type naturally).
        arrays = {}
        for c in out.column_names:
            want = types.get(c)
            col = out[c]
            if want is not None and col.type != want:
                try:
                    col = pc.cast(col, want)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    pass
            arrays[c] = col
        return pa.table(arrays)

    return lt.union(rt).groupby(_BUCKET_COL) \
        .map_groups(join_bucket, batch_format="pyarrow")
