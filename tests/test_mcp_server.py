"""MCP stdio JSON-RPC server (reference mcp/index.js behavior): drive
the real subprocess over pipes — protocol handshake, tool listing,
tool calls (success / unknown / bad-args all as isError content, never
JSON-RPC errors), framing-header and garbage-line tolerance."""

import json
import subprocess
import sys

from scribe_js_ray.sources.synth_pdf import _Typesetter, _make_pdf
from scribe_js_ray.tools import TOOLS


def _pdf(texts_per_page):
    streams = []
    for lines in texts_per_page:
        ts = _Typesetter()
        for ln in lines:
            ts.line(ln)
        streams.append(ts.stream())
    return _make_pdf(streams, {"F1": "Helvetica"})


def _drive(requests):
    """Feed newline-delimited JSON-RPC lines to the server subprocess,
    return the parsed response lines (in order)."""
    payload = "".join(
        (r if isinstance(r, str) else json.dumps(r)) + "\n"
        for r in requests)
    proc = subprocess.run(
        [sys.executable, "-m", "scribe_js_ray.mcp_server"],
        input=payload, capture_output=True, text=True, timeout=120,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "MCP server started" in proc.stderr
    return [json.loads(ln) for ln in proc.stdout.splitlines() if ln]


def test_protocol_session(tmp_path):
    pdf = tmp_path / "report.pdf"
    pdf.write_bytes(_pdf([["alpha one", "alpha two"], ["beta three"]]))
    (tmp_path / "report.hocr").write_text("<html></html>")

    out = _drive([
        {"jsonrpc": "2.0", "id": 1, "method": "initialize",
         "params": {"protocolVersion": "2025-01-01"}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        "Content-Length: 99",                       # framing skipped
        "{not json",                                # dropped to stderr
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
         "params": {"name": "list_documents",
                    "arguments": {"directory": str(tmp_path)}}},
        {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
         "params": {"name": "extract_document_text",
                    "arguments": {"file": str(pdf)}}},
        {"jsonrpc": "2.0", "id": 5, "method": "tools/call",
         "params": {"name": "no_such_tool"}},
        {"jsonrpc": "2.0", "id": 6, "method": "tools/call",
         "params": {"name": "subset_pdf",
                    "arguments": {"bogus": 1}}},
        {"jsonrpc": "2.0", "id": 7, "method": "ping"},
        {"jsonrpc": "2.0", "id": 8, "method": "bogus/method"},
    ])
    by_id = {r["id"]: r for r in out}
    assert len(out) == 8        # one per id; the notification,
    #                             framing header and garbage emit nothing

    init = by_id[1]["result"]
    assert init["protocolVersion"] == "2025-01-01"
    assert init["capabilities"] == {"tools": {}}
    assert init["serverInfo"]["name"] == "scribe-ray-document-tools"

    listed = by_id[2]["result"]["tools"]
    assert [t["name"] for t in listed] == [t["name"] for t in TOOLS]
    assert all("inputSchema" in t for t in listed)

    docs = json.loads(by_id[3]["result"]["content"][0]["text"])
    assert docs["count"] == 1
    assert docs["documents"][0]["name"] == "report.pdf"
    assert [c["name"] for c in
            docs["documents"][0]["companionDataFiles"]] == ["report.hocr"]

    ext = by_id[4]["result"]
    assert "isError" not in ext
    text = json.loads(ext["content"][0]["text"])["text"]
    assert "0:0  alpha one" in text and "1:0  beta three" in text

    unk = by_id[5]["result"]
    assert unk["isError"] is True
    assert "Unknown tool: no_such_tool" in unk["content"][0]["text"]

    bad = by_id[6]["result"]
    assert bad["isError"] is True
    assert bad["content"][0]["text"].startswith("Error: ")

    assert by_id[7]["result"] == {}
    assert by_id[8]["error"]["code"] == -32601
