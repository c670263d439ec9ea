"""Byte-identical golden check (the north rule's core invariant).

``tests/goldens/extract_goldens.parquet`` holds the frozen extraction
results (text + spans + doc type) for the deterministic synthetic corpus,
generated once with the per-document pipeline in plain Python
(FIXTURES.md §F2).  The DISTRIBUTED Ray pipeline must reproduce every
byte.  Any parser/layout/emit change that shifts output breaks this test
— intentional changes regenerate the goldens in the same commit.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from scribe_js_ray.pipelines.extract import extract_document
from scribe_js_ray.sources.synth import generate_pages_table

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "extract_goldens.parquet")


def _golden_map():
    tbl = pq.read_table(GOLDENS)
    return {u: (t, s, n, d, k) for u, t, s, n, d, k in zip(
        tbl["url"].to_pylist(), tbl["extracted_text"].to_pylist(),
        tbl["spans_json"].to_pylist(), tbl["n_pages"].to_pylist(),
        tbl["doc_type"].to_pylist(), tbl["payload_kind"].to_pylist())}


def test_plain_python_matches_goldens():
    """Per-document pipeline (no Ray) reproduces every golden byte."""
    golden = _golden_map()
    pages = generate_pages_table(200, seed=42)
    checked = 0
    for url, payload, text, lang in zip(pages["url"].to_pylist(),
                                        pages["html"].to_pylist(),
                                        pages["text"].to_pylist(),
                                        pages["lang"].to_pylist()):
        res = extract_document(url, payload, text, lang)
        g_text, g_spans, g_np, g_dt, g_pk = golden[url]
        assert res["extracted_text"] == g_text, url
        assert json.dumps(res["spans"]) == g_spans, url
        assert res["n_pages"] == g_np and res["doc_type"] == g_dt \
            and res["payload_kind"] == g_pk, url
        checked += 1
    assert checked == 200


def test_ray_pipeline_matches_goldens(ray_session):
    """The distributed pipeline is byte-identical to the goldens per url,
    regardless of batching/parallelism."""
    import ray.data as rd

    from scribe_js_ray.pipelines.extract import build_extract_pipeline

    golden = _golden_map()
    pages = generate_pages_table(200, seed=42)
    ds = rd.from_arrow(pages).repartition(7)  # odd batching on purpose
    out = build_extract_pipeline(ds).to_pandas()
    assert len(out) == 200
    for _, row in out.iterrows():
        g_text, _, g_np, g_dt, g_pk = golden[row["url"]]
        assert row["extracted_text"] == g_text, row["url"]
        assert row["n_pages"] == g_np, row["url"]
        assert row["doc_type"] == g_dt and row["payload_kind"] == g_pk
