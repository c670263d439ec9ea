"""MCP (Model Context Protocol) JSON-RPC server over stdio for the
document tools — the analog of the reference's ``mcp/index.js:1-142``:
all tool logic lives in ``tools.py``; this module handles only the
protocol.

Faithful protocol behaviors (mcp/index.js cited per line):
- newline-delimited JSON-RPC 2.0 on stdin/stdout; blank lines and
  ``Content-Length:`` framing headers are skipped (js:113-121);
  unparseable lines log to stderr and are dropped (js:131-133).
- ``initialize`` echoes the client's protocolVersion (default
  2024-11-05) and advertises the tools capability (js:35-46).
- ``notifications/initialized`` is a no-op (js:48-50).
- ``tools/list`` returns the full TOOLS schema array (js:52-55).
- ``tools/call``: unknown tools and handler errors come back as
  ``isError`` content — never a JSON-RPC error — while results are a
  single text content item of pretty-printed JSON (js:57-96).
- ``ping`` → empty result (js:99-102); anything else with an id →
  -32601 Method not found (js:104-106).

Run: ``python -m scribe_js_ray.mcp_server`` (or the ``mcp`` CLI verb).
"""

from __future__ import annotations

import json
import sys
import traceback

from .tools import _HANDLERS, TOOLS

SERVER_INFO = {"name": "scribe-ray-document-tools", "version": "0.1.0"}


def _send(out, msg: dict) -> None:
    out.write(json.dumps(msg) + "\n")
    out.flush()


def _result(out, rid, result: dict) -> None:
    _send(out, {"jsonrpc": "2.0", "id": rid, "result": result})


def _error(out, rid, code: int, message: str) -> None:
    _send(out, {"jsonrpc": "2.0", "id": rid,
                "error": {"code": code, "message": message}})


def handle_request(msg: dict, out) -> None:
    rid = msg.get("id")
    method = msg.get("method")
    params = msg.get("params") or {}

    if method == "initialize":
        _result(out, rid, {
            "protocolVersion": params.get("protocolVersion")
            or "2024-11-05",
            "capabilities": {"tools": {}},
            "serverInfo": dict(SERVER_INFO),
        })
        return
    if method == "notifications/initialized":
        return
    if method == "tools/list":
        _result(out, rid, {"tools": TOOLS})
        return
    if method == "tools/call":
        name = params.get("name")
        args = params.get("arguments") or {}
        fn = _HANDLERS.get(name)
        if fn is None:
            _result(out, rid, {
                "content": [{"type": "text",
                             "text": f"Unknown tool: {name}"}],
                "isError": True,
            })
            return
        try:
            result = fn(**args)
        except Exception as exc:  # handler errors -> isError content
            _result(out, rid, {
                "content": [{
                    "type": "text",
                    "text": f"Error: {exc}\n{traceback.format_exc()}"}],
                "isError": True,
            })
            return
        _result(out, rid, {
            "content": [{"type": "text",
                         "text": json.dumps(result, indent=2)}],
        })
        return
    if method == "ping":
        _result(out, rid, {})
        return
    if rid is not None:
        _error(out, rid, -32601, f"Method not found: {method}")


def serve(inp=None, out=None) -> None:
    """Read newline-delimited JSON-RPC until EOF."""
    inp = inp or sys.stdin
    out = out or sys.stdout
    sys.stderr.write("scribe-ray-document-tools MCP server started\n")
    for line in inp:
        line = line.strip()
        if not line or line.lower().startswith("content-length:"):
            continue
        try:
            msg = json.loads(line)
        except ValueError as exc:
            sys.stderr.write(
                f"Failed to parse JSON-RPC message: {exc}\n")
            continue
        try:
            handle_request(msg, out)
        except Exception as exc:  # js:126-130 internal-error path
            sys.stderr.write(f"Error handling request: {exc}\n")
            if msg.get("id") is not None:
                _error(out, msg["id"], -32603,
                       f"Internal error: {exc}")


if __name__ == "__main__":
    serve()
