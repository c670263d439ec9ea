"""Resumable sharded runner: lineage manifests, skip-done resume, salting."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from scribe_js_ray.pipelines.runner import (
    plan_shards, run_extract_job, shard_done)
from scribe_js_ray.sources.synth import write_pages_parquet


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    write_pages_parquet(str(d), 30, seed=42, rows_per_file=10)
    return str(d)


def test_plan_shards_deterministic():
    shards = plan_shards(["c.parquet", "a.parquet", "b.parquet"], 2)
    assert [s["files"] for s in shards] == [
        ["a.parquet", "b.parquet"], ["c.parquet"]]
    assert [s["shard_id"] for s in shards] == [0, 1]


def test_job_runs_and_writes_lineage(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    summary = run_extract_job(f"{pages_dir}/*.parquet", out,
                              files_per_shard=1, batch_size=8)
    assert summary["shards_total"] == 3
    assert summary["shards_run"] == 3
    assert summary["rows"] == 30
    manifests = sorted(glob.glob(os.path.join(out, "_lineage", "*.json")))
    assert len(manifests) == 3
    m = json.load(open(manifests[0]))
    assert m["status"] == "ok"
    assert m["rows"] == 10
    assert m["text_bytes"] > 0
    assert len(m["input_files"]) == 1
    # output parquet is readable and carries the result schema
    parts = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    tbl = pq.read_table(parts[0])
    assert {"url", "extracted_text", "spans", "doc_type"} <= set(
        tbl.column_names)


def test_resume_skips_done_shards(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    run_extract_job(f"{pages_dir}/*.parquet", out, files_per_shard=1,
                    batch_size=8)
    # simulate a crashed shard: drop one manifest
    victim = os.path.join(out, "_lineage", "shard-00001.json")
    os.remove(victim)
    assert not shard_done(out, 1)
    summary = run_extract_job(f"{pages_dir}/*.parquet", out,
                              files_per_shard=1, batch_size=8)
    assert summary["shards_run"] == 1
    assert summary["shards_skipped"] == 2
    assert shard_done(out, 1)


def test_salting_splits_large_docs(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    # tiny threshold → every doc takes the long-tail branch; results must
    # be identical rows either way
    summary = run_extract_job(f"{pages_dir}/*.parquet", out,
                              files_per_shard=3, large_doc_bytes=64,
                              batch_size=8)
    assert summary["rows"] == 30
    parts = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    urls = []
    for p in parts:
        urls += pq.read_table(p, columns=["url"])["url"].to_pylist()
    assert len(set(urls)) == 30


def test_skip_image_based_drops_empty_image_docs(ray_session, tmp_path):
    """--skip-image-based analog (extractTextDir.js skipImageBased):
    image-native docs with no text are dropped from shard output;
    errored and text-bearing docs always kept."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from scribe_js_ray.sources.synth import make_hocr_simple
    from scribe_js_ray.sources.synth_pdf import PdfWriter

    # image-native PDF: one page, one big inline image, no text
    w = PdfWriter()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    content = (b"q 612 0 0 792 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /G ID "
               + bytes(4) + b" EI Q")
    w.add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 4 0 R >>")
    w.add(f"<< /Length {len(content)} >>\nstream\n".encode()
          + content + b"\nendstream")
    image_pdf = w.build()

    src = tmp_path / "pages.parquet"
    _pq.write_table(pa.table({
        "url": pa.array(["https://t/a", "https://t/b", "https://t/c"]),
        "html": pa.array([make_hocr_simple(random.Random(1)).encode(),
                          image_pdf, b"%PDF-garbage"], pa.large_binary()),
        "text": pa.array(["", "", ""]),
        "lang": pa.array(["eng"] * 3),
    }), src)

    out_keep = tmp_path / "keep"
    out_skip = tmp_path / "skip"
    run_extract_job(str(src), str(out_keep))
    run_extract_job(str(src), str(out_skip), skip_image_based=True)

    def read_urls(d):
        files = glob.glob(os.path.join(d, "**", "*.parquet"),
                          recursive=True)
        t = pa.concat_tables([_pq.read_table(f) for f in files])
        return dict(zip(t["url"].to_pylist(),
                        t["doc_type"].to_pylist()))

    kept = read_urls(str(out_keep))
    skipped = read_urls(str(out_skip))
    assert set(kept) == {"https://t/a", "https://t/b", "https://t/c"}
    assert kept["https://t/b"] == "image"
    # only the empty image-native doc is dropped; the garbage doc has an
    # error and stays
    assert set(skipped) == {"https://t/a", "https://t/c"}


def test_curation_funnel_monotone(ray_session, pages_dir):
    """The e2e curation funnel is monotone non-increasing and
    deterministic over the synthetic corpus."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import curation_funnel

    files = glob.glob(os.path.join(pages_dir, "*.parquet"))
    df = curation_funnel(rd.read_parquet(files))
    assert list(df.stage) == ["input", "extracted", "english",
                              "quality", "deduped"]
    vals = list(df.n_docs)
    assert vals[0] > 0
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    df2 = curation_funnel(rd.read_parquet(files))
    assert list(df2.n_docs) == vals
