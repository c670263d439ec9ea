"""PDF page-subset / metadata-scrub rebuild.

Reimplements the raw-bytes utility path of the reference's
``subsetPdf`` / ``stripMetadataPdf``
(/root/reference/js/export/pdf/subsetPdf.js:323-1114 rebuildPdfSubset)
and its scrub companion (js/pdf/metadata/scrubMetadata.js):

- kept pages keep their ORIGINAL object numbers (cross-page link
  destinations and struct-tree /Pg refs keep resolving); a fresh
  catalog / pages-root / info dict get numbers past the source max
- kept page dicts are rewritten: inherited attributes materialized,
  /Resources pruned to the names the content streams actually invoke
  (Tf fonts, Do xobjects, gs ext-gstates — recursing into form
  XObjects for resource fall-through, subsetPdf.js:94-171), orphan
  /Link annots whose destination page was dropped removed
  (pdfPageRewrite.js:308 annotLinkTargetsDroppedPage)
- everything else ships by reachability: a BFS from the rewritten
  pages + carried catalog entries copies referenced objects; dropped
  pages and the old page tree orphan (subsetPdf.js:919
  traceReferencedObjects)
- the catalog keeps structure/accessibility keys by default
  (StructTreeRoot, MarkInfo, Lang, PageLabels, ViewerPreferences,
  OCProperties; scrubMetadata.js:215 catalogKeepEntries); /Outlines
  is carried only on an identity subset where its /Dest refs still
  resolve (subsetPdf.js:383-391)
- scrub mode (stripMetadataPdf): drops /Metadata /PieceInfo /AA
  /Info /LastModified keys from every copied dict, empties
  doc-information dictionaries recognised by content
  (Author/Creator/Producer/Company/Manager), strips reviewer
  identity (/T /CreationDate /M /NM /RC) from markup annotations,
  renames filename-leaking OCG layers, blanks path-like /URI and
  string /Dest values, and drops whole Metadata/Filespec/
  EmbeddedFile/Sig objects (scrubMetadata.js:16-58,90-210)

Encrypted sources emit decrypted: our parser already strips the crypt
layer (filters intact), so the rebuild just rewrites /Length and omits
the trailer /Encrypt.
"""

from __future__ import annotations

import hashlib
import re

from .content import tokenize_content
from .objects import Name, PdfFile, Ref, StreamObj

# scrubMetadata.js:16 — top-level keys dropped from every copied dict.
DROP_ALWAYS = frozenset(
    {"Metadata", "PieceInfo", "AA", "Info", "LastModified"})
# scrubMetadata.js:40-43 — doc-info dicts recognised by content.
INFO_STRONG = frozenset(
    {"Author", "Creator", "Producer", "Company", "Manager"})
INFO_FIELDS = INFO_STRONG | {
    "Title", "Subject", "Keywords", "CreationDate", "ModDate", "Trapped"}
# scrubMetadata.js:69 — reviewer identity on markup annotations.
ANNOT_IDENTITY = frozenset({"T", "CreationDate", "M", "NM", "RC"})
# scrubMetadata.js:20 — a string that looks like a source filename/path.
FILENAME_LIKE = re.compile(
    r"\.(pdf|ai|psd|indd|tiff?|jpe?g|png|docx?|xlsx?|pptx?|eps|svg)\b"
    r"|[A-Za-z]:\\|/(?:Users|home|Volumes)/", re.I)
WEB_URI_SCHEME = re.compile(
    r"^\s*(?:https?|mailto|ftp|ftps|tel|news|geo|sms):", re.I)


# -- serialization --------------------------------------------------------

def _esc_name(n: str) -> str:
    out = []
    for ch in n:
        o = ord(ch)
        if o < 0x21 or o > 0x7E or ch in "()<>[]{}/%#":
            out.append(f"#{o:02X}")
        else:
            out.append(ch)
    return "".join(out)


def _fmt_num(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    s = f"{v:.6f}".rstrip("0").rstrip(".")
    return s or "0"


def serialize_obj(obj, length_override=None) -> bytes:
    """One parsed object → PDF syntax bytes (Refs preserved, strings
    re-emitted as hex — lossless for arbitrary byte content)."""
    if obj is None:
        return b"null"
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R".encode()
    if isinstance(obj, Name):
        return b"/" + _esc_name(str(obj)).encode()
    if isinstance(obj, bool) or isinstance(obj, (int, float)):
        return _fmt_num(obj).encode()
    if isinstance(obj, (bytes, bytearray)):
        return b"<" + bytes(obj).hex().upper().encode() + b">"
    if isinstance(obj, str):  # a non-Name str (shouldn't occur; be safe)
        return b"/" + _esc_name(obj).encode()
    if isinstance(obj, list):
        return b"[ " + b" ".join(serialize_obj(v) for v in obj) + b" ]"
    if isinstance(obj, StreamObj):
        d = dict(obj.dict)
        d[Name("Length")] = len(obj.raw)
        return (serialize_obj(d) + b"\nstream\n" + bytes(obj.raw)
                + b"\nendstream")
    if isinstance(obj, dict):
        parts = [b"<<"]
        for k, v in obj.items():
            parts.append(b"/" + _esc_name(str(k)).encode())
            parts.append(serialize_obj(v))
        parts.append(b">>")
        return b" ".join(parts)
    raise TypeError(f"unserializable PDF object: {type(obj)}")


# -- used-resource walk (subsetPdf.js:94-171) -----------------------------

def _content_bytes(pdf: PdfFile, node: dict) -> bytes:
    """A page's content streams, concatenated (multiple streams are
    interpreted as one — subsetPdf.js:166-170)."""
    contents = pdf.resolve(node.get("Contents"))
    streams = contents if isinstance(contents, list) else [contents]
    out = []
    for s in streams:
        try:
            out.append(pdf.stream_bytes(s))
        except Exception:
            pass
    return b"\n".join(out)


def collect_used_names(pdf: PdfFile, node: dict, resources) -> dict:
    """Names actually invoked by Tf/Do/gs, recursing into used form
    XObjects so fall-through names count as used."""
    used = {"Font": set(), "XObject": set(), "ExtGState": set()}
    visited: set[int] = set()
    res = pdf.resolve(resources)
    res = res if isinstance(res, dict) else {}
    xobjs = pdf.resolve(res.get("XObject"))
    xobjs = xobjs if isinstance(xobjs, dict) else {}

    def walk(data: bytes, local_xobjs: dict):
        for operands, op in tokenize_content(data):
            if not operands or not isinstance(operands[0], Name):
                continue
            name = str(operands[0])
            if op == "Tf":
                used["Font"].add(name)
            elif op == "gs":
                used["ExtGState"].add(name)
            elif op == "Do":
                used["XObject"].add(name)
                # Form fall-through: its names count as page-used.
                ref = local_xobjs.get(name, xobjs.get(name))
                num = ref.num if isinstance(ref, Ref) else None
                if num is None or num in visited:
                    continue
                visited.add(num)
                xo = pdf.resolve(ref)
                if isinstance(xo, StreamObj) and \
                        str(xo.dict.get("Subtype") or "") == "Form":
                    own = pdf.resolve(xo.dict.get("Resources"))
                    own = own if isinstance(own, dict) else {}
                    own_x = pdf.resolve(own.get("XObject"))
                    try:
                        walk(pdf.stream_bytes(xo),
                             own_x if isinstance(own_x, dict) else {})
                    except Exception:
                        pass

    walk(_content_bytes(pdf, node), {})
    return used


def prune_resources(pdf: PdfFile, resources, used: dict) -> dict:
    """Prune /Font /XObject /ExtGState to used names; other subdicts
    pass through unchanged (subsetPdf.js:218-248)."""
    res = pdf.resolve(resources)
    if not isinstance(res, dict):
        return {}
    out = {}
    for k, v in res.items():
        key = str(k)
        if key in used:
            sub = pdf.resolve(v)
            if isinstance(sub, dict):
                kept = {n: sv for n, sv in sub.items()
                        if str(n) in used[key]}
                if kept:
                    out[k] = kept
                continue
        out[k] = v
    return out


# -- orphan link annots (pdfPageRewrite.js:308) ---------------------------

def _dest_target_page(pdf: PdfFile, dest) -> int | None:
    dest = pdf.resolve(dest)
    if isinstance(dest, list) and dest and isinstance(dest[0], Ref):
        return dest[0].num
    return None


def link_targets_dropped_page(pdf: PdfFile, annot, kept: set) -> bool:
    a = pdf.resolve(annot)
    if not isinstance(a, dict) or str(a.get("Subtype") or "") != "Link":
        return False
    target = _dest_target_page(pdf, a.get("Dest"))
    if target is None:
        action = pdf.resolve(a.get("A"))
        if isinstance(action, dict) and \
                str(action.get("S") or "") == "GoTo":
            target = _dest_target_page(pdf, action.get("D"))
    # Named destinations need a name-tree lookup this skips (kept).
    return target is not None and target not in kept


# -- scrub transforms (scrubMetadata.js) ----------------------------------

def _leak_text(pdf: PdfFile, v) -> str:
    v = pdf.resolve(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("latin-1", "replace")
    return str(v) if v is not None else ""


def _scrub_dict(pdf: PdfFile, d: dict, state: dict) -> dict:
    is_info = any(str(k) in INFO_STRONG for k in d)
    is_annot = str(pdf.resolve(d.get("Type")) or "") == "Annot" or \
        "Subtype" in d and "Rect" in d
    is_markup = (is_annot
                 and str(pdf.resolve(d.get("Subtype")) or "") != "Widget"
                 and ("T" in d or "CreationDate" in d))
    is_ocg = str(pdf.resolve(d.get("Type")) or "") == "OCG"
    out = {}
    for k, v in d.items():
        key = str(k)
        if key in DROP_ALWAYS:
            continue
        if is_info and key in INFO_FIELDS:
            continue
        if is_markup and key in ANNOT_IDENTITY:
            continue
        leak = _leak_text(pdf, v) if key in (
            "Name", "Alt", "ActualText", "URI", "D", "Dest") else ""
        if is_ocg and key == "Name" and FILENAME_LIKE.search(leak):
            state["ocg_n"] = state.get("ocg_n", 0) + 1
            out[k] = f"Layer {state['ocg_n']}".encode("latin-1")
            continue
        if key in ("Alt", "ActualText") and FILENAME_LIKE.search(leak):
            continue
        if key == "URI" and FILENAME_LIKE.search(leak) and \
                not WEB_URI_SCHEME.search(leak):
            out[k] = b""
            continue
        if key in ("D", "Dest") and \
                isinstance(pdf.resolve(v), (bytes, bytearray)) and \
                FILENAME_LIKE.search(leak):
            out[k] = b""
            continue
        out[k] = v
    return out


def _scrub_obj(pdf: PdfFile, obj, state: dict):
    """Scrub one copied object; returns None to drop it outright."""
    inner = obj.dict if isinstance(obj, StreamObj) else obj
    if isinstance(inner, dict):
        t = str(pdf.resolve(inner.get("Type")) or "")
        if t in ("Metadata", "Filespec", "EmbeddedFile"):
            return None
        if t == "Sig":
            state["dropped_sigs"] = state.get("dropped_sigs", 0) + 1
            return None
        cleaned = _scrub_dict(pdf, inner, state)
        if isinstance(obj, StreamObj):
            raw = obj.raw
            # Image-internal metadata (EXIF/XMP/IPTC, JP2 xml/uuid
            # boxes) rides the undecoded stream — strip losslessly
            # (scrubMetadata.js:32-33; codestream copied verbatim).
            if str(pdf.resolve(cleaned.get("Subtype"))) == "Image":
                from .imagemeta import (strip_jpeg_metadata,
                                        strip_jpx_metadata)
                from .objects import filter_names
                filt_s = filter_names(pdf.resolve, cleaned)
                if "DCTDecode" in filt_s:
                    raw = strip_jpeg_metadata(raw)
                elif "JPXDecode" in filt_s:
                    raw = strip_jpx_metadata(raw)
            return StreamObj(cleaned, raw)
        return cleaned
    return obj


# -- reachability ---------------------------------------------------------

def _refs_in(obj, out: set):
    if isinstance(obj, Ref):
        out.add(obj.num)
    elif isinstance(obj, list):
        for v in obj:
            _refs_in(v, out)
    elif isinstance(obj, StreamObj):
        _refs_in(obj.dict, out)
    elif isinstance(obj, dict):
        for v in obj.values():
            _refs_in(v, out)


def _page_tree_nums(pdf: PdfFile) -> set:
    """Object numbers of every page-tree NODE (Pages) and page."""
    nums = set()
    root = pdf.resolve(pdf.trailer.get("Root"))
    if not isinstance(root, dict):
        return nums
    stack = [root.get("Pages")]
    seen = 0
    while stack and seen < 100000:
        ref = stack.pop()
        seen += 1
        if isinstance(ref, Ref):
            if ref.num in nums:
                continue
            nums.add(ref.num)
        node = pdf.resolve(ref)
        if isinstance(node, dict) and "Kids" in node:
            kids = pdf.resolve(node.get("Kids"))
            if isinstance(kids, list):
                stack.extend(kids)
    return nums


# -- the rebuild ----------------------------------------------------------

def subset_pdf(data: bytes, page_indices: list[int], scrub: bool = False,
               scrub_opts: dict | None = None,
               extra_annots: dict | None = None) -> bytes:
    """Produce a new PDF containing only ``page_indices`` of the input
    (subsetPdf.js:1056).  ``scrub`` sanitizes identifying metadata
    (stripMetadataPdf semantics).  ``extra_annots`` maps a SOURCE page
    index to parsed annotation dicts appended to that page's /Annots
    (the markup-annotation injection path of the reference's
    annotated download, writePdfAnnots.js)."""
    from .doc import _walk_pages
    opts = {"stripStructTree": False, "stripPageLabels": False,
            "stripViewerPrefs": False, "dropOCProperties": False,
            **(scrub_opts or {})}
    pdf = PdfFile(data)
    pages = _walk_pages(pdf)
    if not page_indices:
        raise ValueError("subset_pdf: page_indices is empty")
    for i in page_indices:
        if not 0 <= i < len(pages):
            raise IndexError(
                f"subset_pdf: page {i} out of range (0-{len(pages) - 1})")

    max_num = max(list(pdf.offsets) + list(pdf.compressed) + [0])
    catalog_num = max_num + 1
    pages_root_num = max_num + 2
    info_num = max_num + 3
    kept_nums = {pages[i]["_ref_num"] for i in page_indices
                 if pages[i]["_ref_num"] is not None}
    tree_nums = _page_tree_nums(pdf)
    state: dict = {}
    next_extra = info_num + 1

    # Rewritten kept pages, original object numbers preserved.
    out_objs: list[tuple[int, bytes]] = []
    trace_roots: list = []
    page_out_nums: list[int] = []  # final object number per kept page
    for i in page_indices:
        info = pages[i]
        node = dict(info["_node"])
        for key in ("Resources", "MediaBox", "CropBox", "Rotate"):
            if key not in node and key in info:
                node[Name(key)] = info[key]
        node[Name("Parent")] = Ref(pages_root_num)
        used = collect_used_names(pdf, node, node.get("Resources"))
        node[Name("Resources")] = prune_resources(
            pdf, node.get("Resources"), used)
        annots = pdf.resolve(node.get("Annots"))
        if isinstance(annots, list):
            kept_annots = [a for a in annots
                           if not link_targets_dropped_page(
                               pdf, a, kept_nums)]
            if kept_annots:
                node[Name("Annots")] = kept_annots
            else:
                node.pop("Annots", None)
        extra = (extra_annots or {}).get(i) or []
        if extra:
            refs = []
            for a in extra:
                out_objs.append((next_extra, serialize_obj(a)))
                refs.append(Ref(next_extra))
                next_extra += 1
            cur = pdf.resolve(node.get("Annots"))
            node[Name("Annots")] = (list(cur) if isinstance(cur, list)
                                    else []) + refs
        if scrub:
            node = _scrub_dict(pdf, node, state)
        num = info["_ref_num"]
        if num is None:  # page stored only inline (rare): allocate
            num = next_extra
            next_extra += 1
        out_objs.append((num, serialize_obj(node)))
        page_out_nums.append(num)
        trace_roots.append(node)

    # Catalog keep-entries (scrubMetadata.js:215 + subsetPdf.js:372-392).
    root = pdf.resolve(pdf.trailer.get("Root"))
    root = root if isinstance(root, dict) else {}
    catalog = {Name("Type"): Name("Catalog"),
               Name("Pages"): Ref(pages_root_num)}
    wants = {"StructTreeRoot": not opts["stripStructTree"],
             "MarkInfo": not opts["stripStructTree"],
             "Lang": True,
             "PageLabels": not opts["stripPageLabels"],
             "ViewerPreferences": not opts["stripViewerPrefs"],
             "OCProperties": not opts["dropOCProperties"]}
    if not scrub:
        wants["Metadata"] = True
        wants["AcroForm"] = True
    identity = list(page_indices) == list(range(len(pages)))
    if identity:
        wants["Outlines"] = True
    for key, keep in wants.items():
        if keep and key in root:
            catalog[Name(key)] = root[key]
    trace_roots.append(catalog)

    # Reachability BFS; dropped pages and the old tree orphan.
    seen_refs: set = set()
    for r in trace_roots:
        _refs_in(r, seen_refs)
    queue = [n for n in seen_refs
             if n not in kept_nums and n not in tree_nums]
    emitted = set(kept_nums)
    while queue:
        num = queue.pop()
        if num in emitted:
            continue
        emitted.add(num)
        obj = pdf.get_object(num)
        if obj is None:
            continue
        if scrub:
            obj = _scrub_obj(pdf, obj, state)
            if obj is None:
                continue
        out_objs.append((num, serialize_obj(obj)))
        new_refs: set = set()
        _refs_in(obj, new_refs)
        for n in new_refs:
            if n not in emitted and n not in seen_refs and \
                    n not in kept_nums and n not in tree_nums:
                queue.append(n)
            seen_refs.add(n)

    kids = [Ref(n) for n in page_out_nums]
    pages_root = {Name("Type"): Name("Pages"), Name("Kids"): kids,
                  Name("Count"): len(kids)}
    out_objs.append((catalog_num, serialize_obj(catalog)))
    out_objs.append((pages_root_num, serialize_obj(pages_root)))

    info_ref = None
    if not scrub:
        info = pdf.resolve(pdf.trailer.get("Info"))
        if isinstance(info, dict) and info:
            out_objs.append((info_num, serialize_obj(info)))
            info_ref = info_num

    # Assemble: header, objects, classic xref, trailer.  The output is
    # a derivative of the same source document, so /ID keeps the
    # permanent element and recomputes the changing one
    # (subsetPdf.js:1021-1024); a scrub drops the ID pair entirely.
    parts = [b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"]
    pos = sum(len(p) for p in parts)
    offsets = {}
    for num, body in sorted(out_objs):
        offsets[num] = pos
        chunk = f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        parts.append(chunk)
        pos += len(chunk)
    size = max(offsets) + 1
    xref = [b"xref\n", f"0 {size}\n".encode(),
            b"0000000000 65535 f \n"]
    for n in range(1, size):
        if n in offsets:
            xref.append(f"{offsets[n]:010d} 00000 n \n".encode())
        else:
            xref.append(b"0000000000 65535 f \n")
    trailer = {Name("Size"): size, Name("Root"): Ref(catalog_num)}
    if info_ref:
        trailer[Name("Info")] = Ref(info_ref)
    if not scrub:
        ids = pdf.trailer.get("ID")
        id0 = ids[0] if isinstance(ids, list) and ids else None
        if isinstance(id0, str):
            id0 = id0.encode("latin-1")
        id1 = hashlib.md5(b"".join(parts)).digest()
        trailer[Name("ID")] = [id0 if isinstance(id0, (bytes, bytearray))
                               else id1, id1]
    parts.extend(xref)
    parts.append(b"trailer\n" + serialize_obj(trailer)
                 + f"\nstartxref\n{pos}\n%%EOF\n".encode())
    return b"".join(parts)


def strip_metadata_pdf(data: bytes, scrub_opts: dict | None = None) -> bytes:
    """Identity subset + scrub (stripMetadataPdf, subsetPdf.js:1105)."""
    pdf = PdfFile(data)
    from .doc import _walk_pages
    n = len(_walk_pages(pdf))
    return subset_pdf(data, list(range(n)), scrub=True,
                      scrub_opts=scrub_opts)


def _remap(obj, num_map: dict):
    """Deep-rewrite indirect refs through an old→new map (mergePdfs.js
    rewriteIndirectRefs); unmapped refs pass through untouched."""
    if isinstance(obj, Ref):
        new = num_map.get(obj.num)
        return Ref(new, obj.gen) if new is not None else obj
    if isinstance(obj, list):
        return [_remap(v, num_map) for v in obj]
    if isinstance(obj, StreamObj):
        return StreamObj(_remap(obj.dict, num_map), obj.raw)
    if isinstance(obj, dict):
        return {k: _remap(v, num_map) for k, v in obj.items()}
    return obj


def merge_pdfs(inputs: list[bytes]) -> bytes:
    """Concatenate the pages of several PDFs into one
    (/root/reference/js/export/pdf/mergePdfs.js:118): every source's
    page-reachable objects are renumbered into one space (pages first,
    contiguous; the old page trees orphan), /Parent re-pointed at the
    new pages root, metadata and /OCProperties carried from the FIRST
    source only, and undefined-but-referenced numbers backfilled with
    null objects.  The /ID pair is fresh — a merge is a new document,
    not a revision of any input."""
    from .doc import _walk_pages
    if not inputs:
        raise ValueError("merge_pdfs: inputs must be a non-empty list")

    catalog_num, pages_root_num = 1, 2
    next_num = 3
    out_objs: list[tuple[int, bytes]] = []
    kid_refs: list[Ref] = []
    first_info = None
    first_ocprops = None

    for si, data in enumerate(inputs):
        pdf = PdfFile(data)
        pages = _walk_pages(pdf)
        if not pages:
            raise ValueError("merge_pdfs: an input PDF has zero pages")
        tree_nums = _page_tree_nums(pdf)

        # Materialized page dicts (inherited attrs pulled down so the
        # orphaned source tree is not needed), then their copy set.
        page_dicts = []
        for info in pages:
            node = dict(info["_node"])
            for key in ("Resources", "MediaBox", "CropBox", "Rotate"):
                if key not in node and key in info:
                    node[Name(key)] = info[key]
            node[Name("Parent")] = Ref(pages_root_num)
            page_dicts.append(node)

        copy_set: set = set()
        queue: list = []
        for node in page_dicts:
            refs: set = set()
            _refs_in(node, refs)
            queue.extend(refs)
        while queue:
            num = queue.pop()
            if num in copy_set or num in tree_nums:
                continue
            copy_set.add(num)
            refs = set()
            _refs_in(pdf.get_object(num), refs)
            queue.extend(r for r in refs
                         if r not in copy_set and r not in tree_nums)

        num_map: dict[int, int] = {}
        for info in pages:          # pages first: contiguous output
            if info["_ref_num"] is not None:
                num_map[info["_ref_num"]] = next_num
                next_num += 1
        page_nums = set(num_map)
        for old in sorted(copy_set - page_nums):
            num_map[old] = next_num
            next_num += 1

        for info, node in zip(pages, page_dicts):
            old = info["_ref_num"]
            if old is not None:
                new = num_map[old]
            else:
                new = next_num
                next_num += 1
            out_objs.append((new, serialize_obj(_remap(node, num_map))))
            kid_refs.append(Ref(new))
        for old in sorted(copy_set - page_nums):
            obj = pdf.get_object(old)
            # A source can reference numbers its xref never defines;
            # the spec's value for an undefined ref is null.
            out_objs.append((num_map[old],
                             serialize_obj(_remap(obj, num_map))))

        if si == 0:
            info_d = pdf.resolve(pdf.trailer.get("Info"))
            if isinstance(info_d, dict) and info_d:
                first_info = _remap(info_d, num_map)
            root = pdf.resolve(pdf.trailer.get("Root"))
            if isinstance(root, dict) and "OCProperties" in root:
                ocp = root["OCProperties"]
                if isinstance(ocp, Ref):
                    first_ocprops = Ref(num_map.get(ocp.num, ocp.num))
                else:
                    first_ocprops = _remap(pdf.resolve(ocp), num_map)

    catalog = {Name("Type"): Name("Catalog"),
               Name("Pages"): Ref(pages_root_num)}
    if first_ocprops is not None:
        catalog[Name("OCProperties")] = first_ocprops
    out_objs.append((catalog_num, serialize_obj(catalog)))
    out_objs.append((pages_root_num, serialize_obj(
        {Name("Type"): Name("Pages"), Name("Kids"): kid_refs,
         Name("Count"): len(kid_refs)})))
    info_ref = None
    if first_info is not None:
        info_ref = next_num
        next_num += 1
        out_objs.append((info_ref, serialize_obj(first_info)))

    parts = [b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"]
    pos = sum(len(p) for p in parts)
    offsets = {}
    for num, body in sorted(out_objs):
        offsets[num] = pos
        chunk = f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        parts.append(chunk)
        pos += len(chunk)
    size = max(offsets) + 1
    xref = [b"xref\n", f"0 {size}\n".encode(), b"0000000000 65535 f \n"]
    for n in range(1, size):
        xref.append(f"{offsets[n]:010d} 00000 n \n".encode()
                    if n in offsets else b"0000000000 65535 f \n")
    fresh_id = hashlib.md5(b"".join(parts)).digest()
    trailer = {Name("Size"): size, Name("Root"): Ref(catalog_num),
               Name("ID"): [fresh_id, fresh_id]}
    if info_ref:
        trailer[Name("Info")] = Ref(info_ref)
    parts.extend(xref)
    parts.append(b"trailer\n" + serialize_obj(trailer)
                 + f"\nstartxref\n{pos}\n%%EOF\n".encode())
    return b"".join(parts)
