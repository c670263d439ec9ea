"""Distributed joins + broadcasts for Ray Data (no native join in 2.49).

``hash_bucket_join`` — the repartition (shuffle) join: both sides are
tagged and bucketed by ``hash(key) % n_buckets``, ONE union+groupby
moves each bucket to one task, and each bucket joins with a vectorized
pandas merge.  n_buckets bounds per-task memory (bucket ≈ |L|+|R| over
n_buckets) and keeps the per-group Python overhead to n_buckets calls
instead of one per key.  ``n_buckets=None`` sizes the bucket count from
the cluster's CPU count; callers holding MATERIALIZED inputs should pass
``buckets_for_bytes(l.size_bytes() + r.size_bytes())`` so per-bucket
memory stays bounded as data grows.

Skew: ``salt > 1`` implements the salted-join recipe for hot keys — the
LEFT (large/probe) side's rows spread across ``salt`` sub-buckets per
key while the RIGHT (small/build) side replicates into all of them, so
one hot key occupies ``salt`` tasks instead of one.  Valid for
inner/left joins (a replicated right row never emits unmatched).

``BroadcastTable`` — the broadcast-side primitive: ``ray.put`` a small
Arrow table ONCE from the driver; every ``map_batches`` task reads it
zero-copy from its node's object store (the ObjectRef in the closure is
bytes, not the table).  Never capture a dict/array of the small side in
a task closure — at cluster scale that pickles the whole table into
every task submission.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_COL = "__join_side"
_BUCKET_COL = "__join_bucket"


class BroadcastTable:
    """Driver-side ``ray.put`` of a small Arrow table + vectorized
    in-task lookup.  Usage::

        bc = BroadcastTable(small_tbl)          # driver, once
        def attach(batch):                      # inside map_batches
            names = bc.lookup(batch["key"], "key", "name")

    ``lookup`` maps a key array to the value column via
    ``pc.index_in`` + ``take`` (missing keys → null)."""

    def __init__(self, table: pa.Table):
        import ray
        self._ref = ray.put(table.combine_chunks())

    def get(self) -> pa.Table:
        import ray
        return ray.get(self._ref)

    def lookup(self, keys, key_col: str, val_col: str):
        tbl = self.get()
        idx = pc.index_in(keys, value_set=tbl[key_col])
        return pc.take(tbl[val_col], idx)


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count, tolerant of an uninitialized Ray (the single
    shared probe — used by bucket sizing here and the multimodal
    actor-pool defaults)."""
    try:
        import ray
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Fibonacci-hash bucket assignment for int64 keys — the ONE bucket
    function every hash-partitioned exchange in this repo must share
    (a divergent copy would silently break key co-location)."""
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h >> np.uint64(40)).astype(np.int64) % n_buckets


def buckets_for_bytes(nbytes: int, target_bucket_bytes: int = 64 << 20,
                      lo: int = 16, hi: int = 4096) -> int:
    """Bucket count so each join task holds ≈target_bucket_bytes, floored
    at the cluster CPU count so the join never under-parallelizes."""
    want = math.ceil(max(nbytes, 1) / target_bucket_bytes)
    return max(lo, min(hi, max(cluster_cpus(), want)))


def _default_buckets() -> int:
    return max(16, min(1024, 2 * cluster_cpus()))


def hash_bucket_join(left, right, on: str, n_buckets: int | None = None,
                     how: str = "inner", salt: int = 1):
    """Join two Datasets on an int64 key column; all other column names
    must be distinct between the sides (caller projects beforehand)."""
    if n_buckets is None:
        n_buckets = _default_buckets()
    if salt > 1 and how not in ("inner", "left"):
        raise ValueError("salted join supports inner/left only "
                         "(replicated right rows would double-count "
                         "unmatched outer output)")

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
            # Fibonacci hash spreads consecutive ids across buckets
            # (plain modulo stripes clustered keys).
            base = bucket_of(keys, n_buckets)
            if salt > 1 and side_id == 0:
                # probe side: spread a hot key's rows round-robin over
                # its salt sub-buckets
                sub = np.arange(n, dtype=np.int64) % salt
                bucket = base * salt + sub
            elif salt > 1:
                # build side: replicate each row into every sub-bucket
                rep = np.repeat(np.arange(n), salt)
                t = t.take(pa.array(rep))
                n = t.num_rows
                sub = np.tile(np.arange(salt, dtype=np.int64),
                              len(base))
                bucket = np.repeat(base, salt) * salt + sub
            else:
                bucket = base
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
