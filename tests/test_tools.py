"""MCP-surface tool registry (reference mcp/tools.js behavior)."""

import json
import os

import pytest

from scribe_js_ray import tools
from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.stages.pdf import parse_pdf_document


@pytest.fixture(autouse=True)
def _fresh_state():
    tools.reset_state()
    yield
    tools.reset_state()


def _pdf(texts_per_page):
    streams = []
    for lines in texts_per_page:
        ts = _Typesetter()
        for ln in lines:
            ts.line(ln)
        streams.append(ts.stream())
    return _make_pdf(streams, {"F1": "Helvetica"})


@pytest.fixture()
def docdir(tmp_path):
    (tmp_path / "report.pdf").write_bytes(
        _pdf([["alpha one", "alpha two"], ["beta three"]]))
    (tmp_path / "report.hocr").write_text("<html></html>")
    (tmp_path / "notes.txt").write_text("loose data")
    (tmp_path / "other.pdf").write_bytes(_pdf([["gamma solo"]]))
    return tmp_path


def test_list_documents_finds_companions(docdir):
    out = tools.list_documents(str(docdir))
    assert out["count"] == 2
    by_name = {d["name"]: d for d in out["documents"]}
    comp = by_name["report.pdf"]["companionDataFiles"]
    assert [c["name"] for c in comp] == ["report.hocr"]
    assert "companionDataFiles" not in by_name["other.pdf"]


def test_load_and_extract_with_line_prefixes(docdir):
    res = tools.load_document(str(docdir / "report.pdf"))
    assert res["pageCount"] == 2 and res["hasOcrData"]
    out = tools.extract_document_text()     # uses the loaded doc
    assert "0:0  alpha one" in out["text"]
    assert "0:1  alpha two" in out["text"]
    assert "1:0  beta three" in out["text"]
    assert out["hasMore"] is False and out["endPage"] == 1


def test_extract_pagination_stops_before_overflow(docdir):
    tools.load_document(str(docdir / "report.pdf"))
    out = tools.extract_document_text(maxChars=20)
    # First page always emits even over budget; second page held back.
    assert out["endPage"] == 0 and out["hasMore"] is True
    out2 = tools.extract_document_text(startPage=out["endPage"] + 1,
                                       maxChars=20)
    assert "beta three" in out2["text"] and out2["hasMore"] is False


def test_extract_unloaded_errors():
    out = tools.extract_document_text()
    assert "error" in out


def test_subset_and_merge_tools(docdir, tmp_path):
    sub = tools.call_tool("subset_pdf", {
        "file": str(docdir / "report.pdf"),
        "outputPath": str(tmp_path / "sub.pdf"), "pages": [1]})
    assert sub["pageCount"] == 1
    pages, _ = parse_pdf_document((tmp_path / "sub.pdf").read_bytes())
    assert len(pages) == 1
    merged = tools.call_tool("merge_pdfs", {
        "files": [{"file": str(docdir / "other.pdf")},
                  {"file": str(docdir / "report.pdf"), "pages": [1]}],
        "outputPath": str(tmp_path / "merged.pdf")})
    assert merged["pageCount"] == 2
    pages, _ = parse_pdf_document((tmp_path / "merged.pdf").read_bytes())
    texts = [" ".join(w.text for ln in p.lines for w in ln.words)
             for p in pages]
    assert texts == ["gamma solo", "beta three"]


def test_define_and_extract_tables(docdir, tmp_path):
    tools.load_document(str(docdir / "report.pdf"))
    res = tools.define_tables(0, [{"rows": [["h1", "h2"],
                                            ["a", "1"]]}])
    assert res["tableCount"] == 1
    got = tools.extract_tables(page=0,
                               outputPath=str(tmp_path / "t.xlsx"))
    assert got["tables"][0]["rows"] == [["h1", "h2"], ["a", "1"]]
    assert os.path.exists(got["outputPath"])
    # Undefined page falls back to detection (none here → empty).
    assert tools.extract_tables(page=1)["count"] == 0


def test_batch_extract_writes_mtxt(docdir, tmp_path):
    out = tools.batch_extract_text(str(docdir), str(tmp_path / "out"))
    assert out["count"] == 2
    mtxt = (tmp_path / "out" / "other.mtxt").read_text()
    assert "0:0  gamma solo" in mtxt


def test_call_tool_error_paths(docdir):
    assert "error" in tools.call_tool("no_such_tool", {})
    assert "error" in tools.call_tool("subset_pdf", {"bogus": 1})
    assert "error" in tools.load_document(str(docdir / "missing.pdf"))


def test_registry_lists_schemas():
    names = {t["name"] for t in tools.TOOLS}
    assert {"list_documents", "extract_document_text", "subset_pdf",
            "merge_pdfs", "extract_tables",
            "batch_extract_text"} <= names
    for t in tools.TOOLS:
        assert t["inputSchema"]["type"] == "object"
        json.dumps(t)    # serializable


def test_list_and_set_form_fields(tmp_path):
    from tests.test_pdf_annots import _pdf_with_field

    from scribe_js_ray import tools

    p = tmp_path / "form.pdf"
    p.write_bytes(_pdf_with_field())
    tools.reset_state()
    res = tools.call_tool("list_form_fields", {"file": str(p)})
    assert [f["name"] for f in res["fields"]] == ["name"]
    assert res["fields"][0]["value"] == "John Doe"

    res = tools.call_tool("set_form_value",
                          {"name": "name", "value": "Jane Roe"})
    assert res["updated"] == 1
    out = tools.call_tool("extract_document_text", {})
    assert "Jane Roe" in out["text"] and "John" not in out["text"]

    # unknown field reports the available names
    res = tools.call_tool("set_form_value", {"name": "nope"})
    assert res["updated"] == 0 and res["fields"] == ["name"]
