"""Resumable corpus-scale extraction runner (north-rule scale surface).

Models the reference's corpus verb ``extractTextDir`` (skip-existing
resume, per-file error capture — /root/reference/js/extractTextDir.js:16-242)
as a sharded Ray Data job:

* **Sharding**: the input file list is split into deterministic shards
  (sorted paths, fixed group size).  One shard = one independent
  ``read_parquet → extract → write_parquet`` pipeline writing to its own
  ``shard=<id>/`` directory — the resumable unit.  At 100 TB a shard is a
  few input files; a 256-node cluster runs shards back-to-back with the
  streaming executor pipelining read/parse/write inside each.
* **Resume**: a shard that finished has a ``_lineage/shard-<id>.json``
  manifest (status=ok).  Re-running skips those shards (anti-join of done
  work, extractTextDir.js:143-149 behavior); a killed run loses at most
  the in-flight shard, whose directory is rewritten from scratch.
* **Skew/salting**: payload-size column computed zero-copy; oversized
  documents are routed to a dedicated branch processed one-doc-per-batch
  so a 100 MB PDF never rides in a 32-doc batch behind 31 small pages
  (SURVEY §4 skew rule; north rule "skewed oversized documents salted
  into a repartitioned long tail").
* **Lineage + metrics**: per-shard manifest carries input files, row and
  byte counts, error count, wall time — the per-partition lineage +
  row-count/byte metrics the north rule checkpoints.

Run via ``python -m scribe_js_ray.cli extract ...`` (ray job submit entry).
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_LARGE_DOC_BYTES = 1 << 20  # 1 MiB payload → long-tail branch


def _add_payload_bytes(batch):
    # binary_length is O(1) per row off the offsets buffer — zero-copy.
    return batch.append_column(
        "payload_bytes", pc.cast(pc.binary_length(batch["html"]), "int64"))


def plan_shards(input_paths: list[str], files_per_shard: int = 1):
    """Deterministic shard plan: sorted file list → fixed-size groups."""
    paths = sorted(input_paths)
    return [
        {"shard_id": i // files_per_shard,
         "files": paths[i:i + files_per_shard]}
        for i in range(0, len(paths), files_per_shard)
    ]


def _manifest_path(output_dir: str, shard_id: int) -> str:
    return os.path.join(output_dir, "_lineage", f"shard-{shard_id:05d}.json")


def shard_done(output_dir: str, shard_id: int) -> bool:
    p = _manifest_path(output_dir, shard_id)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("status") == "ok"
    except (OSError, ValueError):
        return False


def _collect_output_metrics(shard_dir: str) -> tuple[int, int]:
    """Rows + extracted-text bytes from the written parquet footers (no
    re-read of data pages)."""
    rows = 0
    text_bytes = 0
    for f in glob.glob(os.path.join(shard_dir, "**", "*.parquet"),
                       recursive=True):
        md = pq.ParquetFile(f).metadata
        rows += md.num_rows
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == "extracted_text":
                    text_bytes += col.total_uncompressed_size
    return rows, text_bytes


def run_extract_shard(files: list[str], shard_dir: str,
                      large_doc_bytes: int = DEFAULT_LARGE_DOC_BYTES,
                      batch_size: int = 32, concurrency=None,
                      emit_format: str = "text",
                      emit_opts: dict | None = None,
                      skip_image_based: bool = False) -> dict:
    """One shard: read → size-split → extract (both branches share the
    same batch transform; ``concurrency`` caps task parallelism in
    either compute mode) → union → write.  Returns metric counters.

    ``skip_image_based`` drops image-native PDFs that produced no text
    instead of writing empty rows (the reference extract verb's
    --skip-image-based, extractTextDir.js skipImageBased)."""
    import ray.data as rd

    from .extract import build_extract_pipeline

    ds = rd.read_parquet(files) \
        .map_batches(_add_payload_bytes, batch_format="pyarrow")
    small = ds.filter(expr=f"payload_bytes <= {large_doc_bytes}")
    large = ds.filter(expr=f"payload_bytes > {large_doc_bytes}")
    out_small = build_extract_pipeline(small, batch_size=batch_size,
                                       concurrency=concurrency,
                                       emit_format=emit_format,
                                       emit_opts=emit_opts)
    # Long-tail branch: one document per task so stragglers parallelize.
    out_large = build_extract_pipeline(large, batch_size=1,
                                       concurrency=concurrency,
                                       emit_format=emit_format,
                                       emit_opts=emit_opts)
    out = out_small.union(out_large)
    if skip_image_based:
        # image-native with no extracted text and no error → skipped row
        out = out.filter(
            expr="doc_type != 'image' or extracted_text != '' "
                 "or error != ''")
    out.write_parquet(shard_dir)
    rows, text_bytes = _collect_output_metrics(shard_dir)
    n_errors = sum(
        1 for f in glob.glob(os.path.join(shard_dir, "**", "*.parquet"),
                             recursive=True)
        for v in pq.read_table(f, columns=["error"])["error"].to_pylist()
        if v)
    return {"rows": rows, "text_bytes": text_bytes, "errors": n_errors}


def run_extract_job(input_glob: str, output_dir: str,
                    files_per_shard: int = 1,
                    large_doc_bytes: int = DEFAULT_LARGE_DOC_BYTES,
                    batch_size: int = 32, concurrency=None,
                    force: bool = False,
                    emit_format: str = "text",
                    emit_opts: dict | None = None,
                    skip_image_based: bool = False) -> dict:
    """Sharded, resumable corpus extraction.  Returns a job summary."""
    import shutil

    # recursive=True lets '**' globs mirror the reference extract verb's
    # --recursive directory walk (extract.js -R)
    paths = sorted(glob.glob(input_glob, recursive=True)) if any(
        c in input_glob for c in "*?[") else [input_glob]
    if not paths:
        raise FileNotFoundError(f"no input files match {input_glob!r}")
    shards = plan_shards(paths, files_per_shard)
    os.makedirs(os.path.join(output_dir, "_lineage"), exist_ok=True)

    summary = {"shards_total": len(shards), "shards_run": 0,
               "shards_skipped": 0, "rows": 0, "text_bytes": 0, "errors": 0}
    for shard in shards:
        sid = shard["shard_id"]
        if not force and shard_done(output_dir, sid):
            summary["shards_skipped"] += 1
            continue
        shard_dir = os.path.join(output_dir, f"shard={sid:05d}")
        if os.path.isdir(shard_dir):  # partial output from a killed run
            shutil.rmtree(shard_dir)
        t0 = time.perf_counter()
        metrics = run_extract_shard(
            shard["files"], shard_dir, large_doc_bytes=large_doc_bytes,
            batch_size=batch_size, concurrency=concurrency,
            emit_format=emit_format, emit_opts=emit_opts,
            skip_image_based=skip_image_based)
        manifest = {
            "status": "ok",
            "shard_id": sid,
            "input_files": shard["files"],
            "wall_sec": round(time.perf_counter() - t0, 3),
            **metrics,
        }
        tmp = _manifest_path(output_dir, sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, _manifest_path(output_dir, sid))  # atomic commit
        summary["shards_run"] += 1
        for k in ("rows", "text_bytes", "errors"):
            summary[k] += metrics[k]
    return summary
