"""PDF identifying-metadata inspection (read-only report).

Decision-surface port of
/root/reference/js/pdf/metadata/metadataInspect.js getMetadata: every
category of identifying metadata a PDF can embed, surfaced raw so the
user sees exactly what is there — document info, the document ID, XMP
packets (catalog + per-object), PieceInfo, optional-content layer
names, embedded files, launch actions/JavaScript, image-internal
EXIF/XMP/IPTC, signatures, hidden custom info dicts, annotation
reviewer names, retained prior revisions, and encryption.  The
companion remover is ``subset.py``'s scrub mode.

Built on the parsed object model (``PdfFile``) rather than the
reference's byte-scraping — same report shape, cleaner extraction.
"""

from __future__ import annotations

from .annots import decode_pdf_string
from .imagemeta import inspect_jpeg_metadata, inspect_jpx_metadata
from .objects import PdfFile, Ref, StreamObj, filter_names

_INFO_ID_KEYS = ("Author", "Producer", "Creator", "Company", "Manager")
_INFO_ALL_KEYS = _INFO_ID_KEYS + ("Title", "Subject", "Keywords",
                                  "Signer(s)")


def _fmt_id(v) -> str | None:
    if isinstance(v, (bytes, bytearray)):
        return "<" + v.hex().upper() + ">"
    if isinstance(v, str):
        return "(" + v + ")"
    return None


def get_metadata(data: bytes) -> dict:
    """Enumerate all identifying metadata in a PDF (grouped raw-value
    report, metadataInspect.js:85-224 shape)."""
    pdf = PdfFile(data)
    report = {
        "info": None,
        "docId": None,
        "xmp": {"catalog": None, "perObject": []},
        "pieceInfo": [],
        "ocgs": [],
        "embeddedFiles": [],
        "actions": {"openAction": False, "aa": False, "javascript": False},
        "images": [],
        "structTree": False,
        "lang": None,
        "pageLabels": False,
        "viewerPreferences": False,
        "signatures": [],
        "customInfo": [],
        "annotationAuthors": [],
        "priorRevisions": pdf.n_revisions,
        "encrypted": pdf.trailer.get("Encrypt") is not None,
    }

    # Trailer: /ID, /Info
    ids = pdf.resolve(pdf.trailer.get("ID"))
    if isinstance(ids, list) and ids:
        report["docId"] = _fmt_id(pdf.resolve(ids[0]))
    info_ref = pdf.trailer.get("Info")
    info_num = info_ref.num if isinstance(info_ref, Ref) else -1
    info = pdf.resolve(info_ref)
    if isinstance(info, dict) and info:
        report["info"] = {str(k): decode_pdf_string(pdf.resolve(v))
                          for k, v in info.items()}

    # Catalog-level keys
    catalog = pdf.resolve(pdf.trailer.get("Root"))
    cat_meta_num = -1
    if isinstance(catalog, dict):
        meta_ref = catalog.get("Metadata")
        if meta_ref is not None:
            if isinstance(meta_ref, Ref):
                cat_meta_num = meta_ref.num
            try:
                report["xmp"]["catalog"] = pdf.stream_bytes(meta_ref) \
                    .decode("latin-1", "replace")
            except Exception:
                report["xmp"]["catalog"] = "(unreadable)"
        report["actions"]["openAction"] = "OpenAction" in catalog
        report["actions"]["aa"] = "AA" in catalog
        report["structTree"] = "StructTreeRoot" in catalog
        report["pageLabels"] = "PageLabels" in catalog
        report["viewerPreferences"] = "ViewerPreferences" in catalog
        lang = pdf.resolve(catalog.get("Lang"))
        if lang is not None:
            report["lang"] = decode_pdf_string(lang)
        names = pdf.resolve(catalog.get("Names"))
        if isinstance(names, dict):
            report["actions"]["javascript"] = "JavaScript" in names

    # Per-object sweep: XMP, PieceInfo, OCG names, embedded files,
    # signatures, hidden custom info dicts, annotation authors.
    obj_nums = sorted(set(pdf.offsets) | set(pdf.compressed))
    for num in obj_nums:
        try:
            obj = pdf.get_object(num)
        except Exception:
            continue
        d = obj.dict if isinstance(obj, StreamObj) else obj
        if not isinstance(d, dict):
            continue
        otype = str(pdf.resolve(d.get("Type")) or "")
        if otype == "Metadata" and num != cat_meta_num:
            if len(report["xmp"]["perObject"]) < 200:
                try:
                    n_bytes = len(pdf.stream_bytes(obj))
                except Exception:
                    n_bytes = 0
                report["xmp"]["perObject"].append(
                    {"objNum": num, "bytes": n_bytes})
        if "PieceInfo" in d:
            report["pieceInfo"].append({"objNum": num})
        if otype == "OCG":
            name = pdf.resolve(d.get("Name"))
            if name is not None:
                report["ocgs"].append(
                    {"objNum": num, "name": decode_pdf_string(name)})
        if otype == "Filespec":
            fn = pdf.resolve(d.get("UF")) or pdf.resolve(d.get("F"))
            report["embeddedFiles"].append(
                {"objNum": num,
                 "name": decode_pdf_string(fn) if fn is not None
                 else "(unnamed)"})
        if otype == "Sig" or (
                "ByteRange" in d and "Contents" in d
                and str(pdf.resolve(d.get("SubFilter")) or "")):
            sub = pdf.resolve(d.get("SubFilter"))
            report["signatures"].append(
                {"objNum": num,
                 "subFilter": f"/{sub}" if sub is not None else None})
        # Info-identifying keys never appear on a functional object, so
        # a non-trailer dict carrying one is a hidden custom info dict
        # a strip must remove (metadataInspect.js:185-193).
        if num != info_num and otype not in ("Metadata", "Catalog"):
            keys = [k for k in _INFO_ALL_KEYS if k in d]
            if any(k in _INFO_ID_KEYS for k in keys):
                vals_ok = any(
                    isinstance(pdf.resolve(d.get(k)), (str, bytes))
                    for k in keys if k in _INFO_ID_KEYS)
                if vals_ok:
                    report["customInfo"].append(
                        {"objNum": num, "keys": keys})
        # /T holds the reviewer's name on a markup annotation but the
        # field name on a Widget.
        if otype == "Annot" or (
                "Subtype" in d and "Rect" in d
                and str(pdf.resolve(d.get("Subtype"))) in (
                    "Text", "FreeText", "Highlight", "Underline",
                    "StrikeOut", "Squiggly", "Ink", "Square", "Circle",
                    "Polygon", "PolyLine", "Caret", "Stamp", "Popup")):
            if str(pdf.resolve(d.get("Subtype"))) != "Widget":
                author = pdf.resolve(d.get("T"))
                if author is not None:
                    report["annotationAuthors"].append(
                        {"objNum": num,
                         "author": decode_pdf_string(author)})
        # Image-internal metadata rides the UNDECODED stream (DCTDecode
        # raw bytes ARE the JPEG codestream).
        if isinstance(obj, StreamObj) \
                and str(pdf.resolve(d.get("Subtype"))) == "Image":
            filt = filter_names(pdf.resolve, d)
            if "DCTDecode" in filt:
                j = inspect_jpeg_metadata(obj.raw)
                if j["hasExif"] or j["hasXmp"] or j["hasIptc"]:
                    report["images"].append(
                        {"objNum": num, "filter": "DCTDecode", **j})
            elif "JPXDecode" in filt:
                x = inspect_jpx_metadata(obj.raw)
                if x["hasXml"] or x["hasUuid"]:
                    report["images"].append(
                        {"objNum": num, "filter": "JPXDecode", **x})
    return report


def format_metadata_report(report: dict, basename: str) -> str:
    """Human-readable summary (cli.js metadataCLI:293-330 shape)."""
    lines = [f"Metadata in {basename}:"]
    if report.get("info"):
        lines.append("\n  Document info (/Info):")
        for k, v in report["info"].items():
            lines.append(f"    {k}: {v}")
    if report.get("docId"):
        lines.append(f"\n  Document ID: {report['docId']}")
    xmp = report.get("xmp") or {}
    if xmp.get("catalog"):
        lines.append(f"\n  XMP packet (document): {len(xmp['catalog'])} "
                     "bytes (use --json to see it in full)")
    if xmp.get("perObject"):
        lines.append(f"  XMP packets (per-object): {len(xmp['perObject'])}")
    if report.get("customInfo"):
        fields = sorted({k for c in report["customInfo"]
                         for k in c["keys"]})
        lines.append("\n  Custom document-info dictionaries: "
                     f"{len(report['customInfo'])} "
                     f"(fields: {', '.join(fields)})")
    if report.get("annotationAuthors"):
        names = sorted({a["author"]
                        for a in report["annotationAuthors"]})
        lines.append(f"\n  Annotation authors: {', '.join(names)}")
    if report.get("pieceInfo"):
        lines.append(f"\n  PieceInfo entries: {len(report['pieceInfo'])}")
    if report.get("ocgs"):
        names = ", ".join(o["name"] for o in report["ocgs"])
        lines.append(f"\n  Optional-content layers: {names}")
    if report.get("embeddedFiles"):
        names = ", ".join(e["name"] for e in report["embeddedFiles"])
        lines.append(f"\n  Embedded files: {names}")
    acts = report.get("actions") or {}
    flags = [k for k in ("openAction", "aa", "javascript") if acts.get(k)]
    if flags:
        lines.append(f"\n  Actions: {', '.join(flags)}")
    if report.get("images"):
        lines.append(f"\n  Images with internal metadata: "
                     f"{len(report['images'])}")
    if report.get("signatures"):
        lines.append(f"\n  Digital signatures: {len(report['signatures'])}")
    if report.get("priorRevisions", 0) > 1:
        lines.append(f"\n  Prior revisions retained: "
                     f"{report['priorRevisions'] - 1}")
    if report.get("encrypted"):
        lines.append("\n  File is encrypted")
    if len(lines) == 1:
        lines.append("  (no identifying metadata found)")
    return "\n".join(lines)
