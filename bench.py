#!/usr/bin/env python
"""Benchmark harness for the scribe_js_ray engine.

Default mode: runs the headline extraction pipeline plus every
``__ray_entry__.queries()`` pipeline over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "extract_docs_per_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the headline extraction job twice in FRESH subprocesses
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency = (T32/T8)/4 — the sandbox stand-in
for the north rule's N→4N cluster-size criterion (BASELINE.json).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else -1.0
    except ValueError:
        return -1.0


def _consume(res) -> int:
    """Fully execute a lazy result; return its row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    n = 0
    for batch in res.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += batch.num_rows
    return n


def run_headline(sf_dir: str) -> dict:
    """Headline: pages-table extraction (classify → parse → layout → emit),
    streamed to completion; metric = extracted docs/sec."""
    import __ray_entry__ as e
    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    t0 = time.perf_counter()
    out = build_extract_pipeline(e._pages_ds(sf_dir), batch_size=32)
    n = _consume(out)
    dt = time.perf_counter() - t0
    return {"rows": n, "sec": dt,
            "docs_per_sec": (n / dt) if dt > 0 else 0.0}


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as e

    timings = {}
    for name, fn in e.queries().items():
        t0 = time.perf_counter()
        try:
            _consume(fn(sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record, never abort the bench
            timings[name] = f"error: {type(exc).__name__}: {exc}"[:200]
    return timings


def _ray_up(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run headline at num_cpus=8 and 32 in fresh "
                         "subprocesses; report scaling efficiency")
    ap.add_argument("--headline-only", action="store_true",
                    help="(internal) headline pipeline only, one JSON line")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--headline-only", "--sf-dir", args.sf_dir],
                env=env, capture_output=True, text=True, timeout=3600)
            line = proc.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        tp8 = results[8]["docs_per_sec"]
        tp32 = results[32]["docs_per_sec"]
        eff = (tp32 / tp8) / 4 if tp8 > 0 else 0.0
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cpus",
            "value": round(eff, 4), "unit": "ratio",
            "docs_per_sec_8cpu": round(tp8, 2),
            "docs_per_sec_32cpu": round(tp32, 2),
            "sec_8cpu": round(results[8]["sec"], 3),
            "sec_32cpu": round(results[32]["sec"], 3),
            "rows": results[32]["rows"],
            "sf": _sf_of(args.sf_dir),
        }))
        return

    _ray_up(num_cpus)
    try:
        head = run_headline(args.sf_dir)
        if args.headline_only:
            print(json.dumps({"rows": head["rows"],
                              "sec": round(head["sec"], 3),
                              "docs_per_sec": round(head["docs_per_sec"], 3),
                              "num_cpus": num_cpus}))
            return
        queries = run_queries(args.sf_dir)
        total = round(head["sec"] + sum(
            v for v in queries.values() if isinstance(v, (int, float))), 3)
        print(json.dumps({
            "metric": "total_bench_sec",
            "value": total,
            "unit": "sec",
            "headline_docs_per_sec": round(head["docs_per_sec"], 2),
            "headline_sec": round(head["sec"], 3),
            "headline_rows": head["rows"],
            "queries": queries,
            "sf": _sf_of(args.sf_dir),
            "num_cpus": num_cpus,
        }))
    finally:
        import ray
        ray.shutdown()


if __name__ == "__main__":
    main()
