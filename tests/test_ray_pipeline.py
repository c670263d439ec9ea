"""End-to-end Ray Data pipeline tests: read_parquet → map_batches extraction
→ write_parquet, checked byte-identical against the pure-Python per-document
path (the golden invariant: same extracted_text per url)."""

import os

import pyarrow.parquet as pq
import pytest

from scribe_js_ray.pipelines.extract import build_extract_pipeline, extract_document
from scribe_js_ray.sources.synth import generate_pages_table, write_pages_parquet

N_DOCS = 40


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "corpus")
    write_pages_parquet(path, N_DOCS, seed=42, rows_per_file=16)
    return path


def test_ray_pipeline_matches_pure_python(ray_session, pages_dir):
    import ray.data as rd
    ds = rd.read_parquet(pages_dir)
    out = build_extract_pipeline(ds, batch_size=8).to_pandas()
    assert len(out) == N_DOCS

    tbl = generate_pages_table(N_DOCS, seed=42)
    expected = {}
    for i in range(N_DOCS):
        row = {c: tbl.column(c)[i].as_py() for c in tbl.column_names}
        res = extract_document(row["url"], row["html"], row["text"],
                               row["lang"])
        expected[row["url"]] = res

    got = {r.url: r for r in out.itertuples()}
    assert set(got) == set(expected)
    for url, exp in expected.items():
        g = got[url]
        assert g.extracted_text == exp["extracted_text"], url
        assert g.n_pages == exp["n_pages"], url
        assert g.doc_type == exp["doc_type"], url
        assert len(g.spans) == len(exp["spans"]), url


def test_ray_pipeline_write_parquet(ray_session, pages_dir, tmp_path):
    import ray.data as rd
    out_dir = str(tmp_path / "extracted")
    ds = rd.read_parquet(pages_dir)
    build_extract_pipeline(ds, batch_size=8).write_parquet(out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    tbl = pq.read_table(out_dir)
    assert tbl.num_rows == N_DOCS
    assert "extracted_text" in tbl.column_names
    assert "spans" in tbl.column_names


def test_pipeline_is_lazy_and_streams(ray_session, pages_dir):
    import ray.data as rd
    ds = rd.read_parquet(pages_dir)
    pipe = build_extract_pipeline(ds, batch_size=8)
    # No execution yet: schema/limit do not require a full pass.
    first = pipe.limit(4).to_pandas()
    assert len(first) == 4
