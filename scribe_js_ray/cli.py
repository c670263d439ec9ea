"""CLI entry point (the ``ray job submit`` surface of the north rule).

    python -m scribe_js_ray.cli extract \
        --input '/data/pages/*.parquet' --output /data/extracted \
        --files-per-shard 4 --batch-size 32

    python -m scribe_js_ray.cli gen-pages --output /tmp/pages.parquet -n 200

Owns its Ray session (scripts only — the driver/`__ray_entry__` never
init Ray).  Resumable: re-running `extract` with the same output dir
skips finished shards via their lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_extract(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        from .pipelines.runner import run_extract_job

        summary = run_extract_job(
            args.input, args.output,
            files_per_shard=args.files_per_shard,
            large_doc_bytes=args.large_doc_bytes,
            batch_size=args.batch_size,
            force=args.force,
            emit_format=args.emit,
            emit_opts={"line_numbers": args.line_numbers,
                       "char_boxes": args.char_boxes},
            skip_image_based=args.skip_image_based)
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


def _parse_page_spec(spec: str, n_pages: int) -> list[int]:
    """"all", "0,2", "1-3,5" → page index list."""
    if spec.strip().lower() == "all":
        return list(range(n_pages))
    out: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            a, b = part.split("-", 1)
            out.extend(range(int(a), int(b) + 1))
        elif part:
            out.append(int(part))
    return out


def _cmd_pdf_subset(args) -> int:
    """Page-subset / metadata-scrub rebuild (subsetPdf.js:1056 /
    stripMetadataPdf:1105 utility surface).  Single-file; no Ray."""
    from .stages.pdf.doc import _walk_pages
    from .stages.pdf.objects import PdfFile
    from .stages.pdf.subset import subset_pdf

    with open(args.input, "rb") as f:
        data = f.read()
    n_pages = len(_walk_pages(PdfFile(data)))
    indices = _parse_page_spec(args.pages, n_pages)
    out = subset_pdf(data, indices, scrub=args.scrub)
    with open(args.output, "wb") as f:
        f.write(out)
    print(json.dumps({"input_pages": n_pages, "kept_pages": len(indices),
                      "scrubbed": bool(args.scrub),
                      "bytes": len(out), "output": args.output}))
    return 0


def _cmd_pdf_merge(args) -> int:
    """Concatenate PDFs (mergePdfs.js:118 utility surface)."""
    from .stages.pdf.subset import merge_pdfs

    inputs = []
    for path in args.inputs:
        with open(path, "rb") as f:
            inputs.append(f.read())
    out = merge_pdfs(inputs)
    with open(args.output, "wb") as f:
        f.write(out)
    print(json.dumps({"inputs": len(inputs), "bytes": len(out),
                      "output": args.output}))
    return 0


def _cmd_pdf_type(args) -> int:
    """Detect PDF file type (cli/detectPDFType.js:17-40): 'Text
    native' / 'Image + OCR text' / 'Image native'; with an output path
    the text layer is extracted (no reflow) and saved."""
    from .stages.pdf import parse_pdf_document

    with open(args.input, "rb") as f:
        data = f.read()
    pages, doc_type = parse_pdf_document(data)
    type_map = {"text": "Text native", "ocr": "Image + OCR text",
                "image": "Image native"}
    if args.output:
        from .stages.emit import write_text
        txt = write_text(pages, reflow_text=False)
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(txt)
    print("PDF Type:", type_map.get(doc_type, "Image native"))
    return 0


def _cmd_conf(args) -> int:
    """Confidence metric from existing conf info in OCR data
    (cli/main.js:81-87 print shape; calcConf ocrUtils.js:11)."""
    from .model import calc_conf
    from .tools import _load_pages

    with open(args.input, "rb") as f:
        payload = f.read()
    pages = _load_pages(payload)
    high, total = calc_conf(pages)
    ratio = high / total if total else 0
    print(f"Confidence: {ratio} ({high} of {total})")
    return 0


def _cmd_strip_metadata(args) -> int:
    """Privacy-cleaned copy of a PDF (cli/scribe.js strip-metadata):
    identifying metadata removed, visible pages unchanged; structure
    tags / page labels / viewer prefs / layers kept unless the matching
    --strip flag is passed."""
    from .stages.pdf.subset import strip_metadata_pdf

    with open(args.input, "rb") as f:
        data = f.read()
    out = strip_metadata_pdf(data, scrub_opts={
        "stripStructTree": args.strip_tags,
        "stripPageLabels": args.strip_page_labels,
        "stripViewerPrefs": args.strip_viewer_prefs,
        "dropOCProperties": args.drop_layers,
    })
    import os
    out_path = args.output
    if out_path is None or os.path.isdir(out_path or "."):
        stem = os.path.splitext(os.path.basename(args.input))[0]
        out_path = os.path.join(out_path or ".", stem + "-clean.pdf")
    with open(out_path, "wb") as f:
        f.write(out)
    print(json.dumps({"output": out_path, "bytes": len(out)}))
    return 0


def _cmd_overlay(args) -> int:
    """Add OCR data to a PDF as a text layer and save as PDF
    (cli/scribe.js overlay: invisible Tr-3 layer by default, visible
    'proof' text with --vis; --conf prints the confidence metric from
    the provided data)."""
    import os

    from .model import calc_conf
    from .sources.classify import classify_payload
    from .stages.pdf.doc import _walk_pages
    from .stages.pdf.objects import PdfFile
    from .stages.pdf_export import overlay_pdf_text
    from .tools import _load_pages

    pdf_path = None
    pdf_data = None
    ocr_pages = None
    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        if classify_payload(data) == "pdf":
            pdf_path, pdf_data = path, data
        else:
            ocr_pages = _load_pages(data)
    if pdf_data is None or ocr_pages is None:
        print("overlay needs one PDF file and one OCR file", file=sys.stderr)
        return 1

    if args.conf:
        high, total = calc_conf(ocr_pages)
        print(f"Confidence: {high / total if total else 0} "
              f"({high} of {total})")

    # OCR coords are in the OCR file's pixel space; ÷ scale → points.
    pdf = PdfFile(pdf_data)
    infos = _walk_pages(pdf)
    scale = None
    if infos and ocr_pages and ocr_pages[0].width:
        mb = pdf.resolve(infos[0].get("MediaBox")) or [0, 0, 612, 792]
        media_w = abs(float(pdf.resolve(mb[2])) - float(pdf.resolve(mb[0])))
        if media_w > 0:
            scale = ocr_pages[0].width / media_w
    out_bytes = overlay_pdf_text(pdf_data, ocr_pages,
                                 text_mode="proof" if args.vis else "invis",
                                 scale=scale)

    stem = os.path.splitext(os.path.basename(pdf_path))[0]
    suffix = "_vis" if args.vis else ""
    out_path = os.path.join(args.output or ".", stem + suffix + ".pdf")
    if os.path.abspath(out_path) == os.path.abspath(pdf_path):
        out_path = os.path.join(args.output or ".",
                                stem + suffix + "_overlay.pdf")
    with open(out_path, "wb") as f:
        f.write(out_bytes)
    print(json.dumps({"output": out_path, "bytes": len(out_bytes),
                      "pages": len(ocr_pages),
                      "mode": "proof" if args.vis else "invis"}))
    return 0


def _cmd_pdf_metadata(args) -> int:
    """Read-only identifying-metadata report (cli.js metadataCLI:276;
    metadataInspect.js getMetadata).  Does not modify the file."""
    import os

    from .stages.pdf.metadata import format_metadata_report, get_metadata

    with open(args.input, "rb") as f:
        data = f.read()
    report = get_metadata(data)
    if args.json:
        out = json.dumps(report, indent=2)
        if args.output:
            with open(args.output, "w", encoding="utf-8") as f:
                f.write(out)
            print(f"Wrote metadata report to {args.output}")
        else:
            print(out)
        return 0
    print(format_metadata_report(report, os.path.basename(args.input)))
    return 0


def _cmd_extract_images(args) -> int:
    """Extract every embedded image XObject from a PDF to files
    (parsePdfImages.js:199 extractImages; ext mapping per
    imageFilterToExt — ours writes decoded .png for Flate-family
    rasters, passthrough .jpg/.jp2 for DCT/JPX)."""
    import os

    from .stages.pdf.images import extract_images

    with open(args.input, "rb") as f:
        data = f.read()
    os.makedirs(args.output, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input))[0]
    n_written = 0
    report = []
    for info in extract_images(data):
        rec = {k: info[k] for k in ("obj_num", "width", "height",
                                    "bits_per_component", "color_space",
                                    "filter", "ext", "error")}
        if info["data"] and not info["error"]:
            path = os.path.join(
                args.output, f"{stem}-im{info['obj_num']}.{info['ext']}")
            with open(path, "wb") as f:
                f.write(info["data"])
            rec["path"] = path
            n_written += 1
        report.append(rec)
    print(json.dumps({"images": report, "written": n_written}))
    return 0


def _cmd_gen_pages(args) -> int:
    from .sources.synth import write_pages_parquet

    write_pages_parquet(args.output, args.n, seed=args.seed)
    print(json.dumps({"output": args.output, "n_docs": args.n}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="scribe_js_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="sharded resumable corpus extraction")
    ex.add_argument("--input", required=True,
                    help="input parquet path or glob (pages table)")
    ex.add_argument("--output", required=True, help="output directory")
    ex.add_argument("--files-per-shard", type=int, default=1)
    ex.add_argument("--large-doc-bytes", type=int, default=1 << 20)
    ex.add_argument("--batch-size", type=int, default=32)
    ex.add_argument("--force", action="store_true",
                    help="reprocess shards even if their manifest is ok")
    ex.add_argument("--emit", default="text",
                    choices=["text", "markdown", "hocr", "alto", "html",
                             "html_viewer", "docx", "xlsx", "pdf", "scribe",
                             "debug_csv"],
                    help="output format (exportData dispatch analog)")
    ex.add_argument("--line-numbers", action="store_true",
                    help="prepend page:line prefixes (txt only; "
                         "reference extract -l)")
    ex.add_argument("--char-boxes", action="store_true",
                    help="include per-char bboxes in .scribe output "
                         "(excluded by default, like the reference CLI)")
    ex.add_argument("--skip-image-based", action="store_true",
                    help="drop image-native PDFs with no text instead "
                         "of writing empty rows")
    ex.set_defaults(fn=_cmd_extract)

    ps = sub.add_parser("pdf-subset",
                        help="extract pages from / scrub metadata of a PDF")
    ps.add_argument("--input", required=True, help="source PDF path")
    ps.add_argument("--output", required=True, help="output PDF path")
    ps.add_argument("--pages", default="all",
                    help='page indices, e.g. "0,2-4" (default: all)')
    ps.add_argument("--scrub", action="store_true",
                    help="strip identifying metadata (stripMetadataPdf)")
    ps.set_defaults(fn=_cmd_pdf_subset)

    pm = sub.add_parser("pdf-merge", help="concatenate PDFs into one")
    pm.add_argument("inputs", nargs="+", help="source PDFs in merge order")
    pm.add_argument("--output", required=True, help="output PDF path")
    pm.set_defaults(fn=_cmd_pdf_merge)

    pt = sub.add_parser("pdf-type", help="detect PDF type (text native / "
                                         "image + OCR text / image native)")
    pt.add_argument("input")
    pt.add_argument("output", nargs="?", default=None,
                    help="optional path to save extracted text")
    pt.set_defaults(fn=_cmd_pdf_type)

    cf = sub.add_parser("conf", help="confidence metric from existing "
                                     "conf info in an OCR file")
    cf.add_argument("input", help="OCR file (.hocr / Abbyy .xml / ...)")
    cf.set_defaults(fn=_cmd_conf)

    sm = sub.add_parser("strip-metadata",
                        help="write a privacy-cleaned copy of a PDF "
                             "with identifying metadata removed")
    sm.add_argument("input")
    sm.add_argument("output", nargs="?", default=None,
                    help="output file, or directory for <stem>-clean.pdf")
    sm.add_argument("--strip-tags", action="store_true",
                    help="also remove accessibility structure tags")
    sm.add_argument("--strip-page-labels", action="store_true")
    sm.add_argument("--strip-viewer-prefs", action="store_true")
    sm.add_argument("--drop-layers", action="store_true",
                    help="also drop optional-content (layer) config")
    sm.set_defaults(fn=_cmd_strip_metadata)

    ov = sub.add_parser("overlay", help="add OCR data to a PDF as a "
                                        "text layer and save as PDF")
    ov.add_argument("files", nargs="+",
                    help="input PDF file and OCR file (.hocr/.xml/...)")
    ov.add_argument("-o", "--output", default=".",
                    help="directory for the output file")
    ov.add_argument("-v", "--vis", action="store_true",
                    help="visible text instead of invisible layer")
    ov.add_argument("-c", "--conf", action="store_true",
                    help="print average confidence metric")
    ov.set_defaults(fn=_cmd_overlay)

    md = sub.add_parser("pdf-metadata",
                        help="list identifying metadata embedded in a "
                             "PDF (read-only)")
    md.add_argument("input")
    md.add_argument("--json", action="store_true",
                    help="emit the full report as JSON")
    md.add_argument("-o", "--output", default=None,
                    help="with --json, write the report to this file")
    md.set_defaults(fn=_cmd_pdf_metadata)

    xi = sub.add_parser("extract-images",
                        help="extract embedded PDF images to files")
    xi.add_argument("--input", required=True)
    xi.add_argument("--output", required=True, help="output directory")
    xi.set_defaults(fn=_cmd_extract_images)

    gp = sub.add_parser("gen-pages", help="write a synthetic pages table")
    gp.add_argument("--output", required=True)
    gp.add_argument("-n", type=int, default=100)
    gp.add_argument("--seed", type=int, default=42)
    gp.set_defaults(fn=_cmd_gen_pages)

    tl = sub.add_parser(
        "tools", help="document tool registry (MCP-surface analog): "
                      "tools list | tools call <name> [--json '{...}']")
    tl.add_argument("tool_args", nargs=argparse.REMAINDER)
    tl.set_defaults(fn=lambda a: __import__(
        "scribe_js_ray.tools", fromlist=["main_tools"]
    ).main_tools(a.tool_args))

    mc = sub.add_parser(
        "mcp", help="MCP JSON-RPC server over stdio exposing the "
                    "document tools (mcp/index.js analog)")
    mc.set_defaults(fn=lambda a: __import__(
        "scribe_js_ray.mcp_server", fromlist=["serve"]).serve())

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
