"""Tagged-PDF structure tree → per-page MCID role maps (SURVEY M21/J4).

Analog of the reference's struct-tree lookup maps
(/root/reference/js/pdf/parsePdfDoc.js structTag/mcid word signals and
analyzeLayout.js's structRole overlay): walk /StructTreeRoot, resolve
/RoleMap aliases, and record for every marked-content ID the nearest
enclosing SEMANTIC element tag (H1-H6/H, P, LI/Lbl/LBody, BlockQuote,
TD/TH/Table, Figure, TOC/TOCI, Caption).

Output: ``{page_obj_num: {mcid: tag}}`` — the caller joins on the page's
object number and each word's mcid.  With ``with_elems=True`` a second
map ``{page_obj_num: {mcid: elem_id}}`` identifies the nearest enclosing
PARAGRAPH-LEVEL element instance (decideBreak's ``structId``,
analyzeLayout.js:2307-2371: same element → one paragraph, different
elements → a producer-authored boundary).
"""

from __future__ import annotations

from .objects import Ref

# Tags that carry layout meaning for the role overlay; everything else
# inherits the nearest meaningful ancestor.
_MEANINGFUL = {
    "H", "H1", "H2", "H3", "H4", "H5", "H6", "Title",
    "P", "L", "LI", "Lbl", "LBody", "BlockQuote", "Quote",
    "Table", "TR", "TD", "TH", "TOC", "TOCI", "Caption", "Figure",
    "Artifact", "Note", "Reference", "BibEntry",
}

# Element kinds whose INSTANCE identity defines a paragraph (the
# reference's structId granularity): block-level text containers.
_PARA_ELEMS = {
    "H", "H1", "H2", "H3", "H4", "H5", "H6", "Title",
    "P", "LI", "Lbl", "LBody", "BlockQuote", "Quote",
    "TOCI", "Caption", "Note", "BibEntry",
}


def parse_struct_tree(pdf, with_elems: bool = False):
    empty = ({}, {}) if with_elems else {}
    root = pdf.resolve(pdf.trailer.get("Root"))
    if not isinstance(root, dict):
        return empty
    st = pdf.resolve(root.get("StructTreeRoot"))
    if not isinstance(st, dict):
        return empty
    role_map = pdf.resolve(st.get("RoleMap")) or {}

    def canon(tag: str, depth=0) -> str:
        while depth < 8:
            mapped = role_map.get(tag)
            if mapped is None:
                return tag
            mapped = str(pdf.resolve(mapped))
            if mapped == tag:
                return tag
            tag = mapped
            depth += 1
        return tag

    out: dict = {}
    out_elems: dict = {}
    next_elem = [0]

    def record(page_num, mcid, tag, elem):
        if page_num is None or mcid is None:
            return
        out.setdefault(page_num, {})[mcid] = tag
        if elem is not None:
            out_elems.setdefault(page_num, {})[mcid] = elem

    def walk(node, inherited_tag, inherited_pg, inherited_elem, depth=0):
        if depth > 64:
            return
        node = pdf.resolve(node)
        if isinstance(node, list):
            for kid in node:
                walk(kid, inherited_tag, inherited_pg, inherited_elem,
                     depth + 1)
            return
        if isinstance(node, (int, float)):
            record(inherited_pg, int(node), inherited_tag, inherited_elem)
            return
        if not isinstance(node, dict):
            return
        ntype = str(node.get("Type") or "")
        if ntype == "MCR":
            pg = node.get("Pg")
            pgn = pg.num if isinstance(pg, Ref) else inherited_pg
            mcid = pdf.resolve(node.get("MCID"))
            if isinstance(mcid, (int, float)):
                record(pgn, int(mcid), inherited_tag, inherited_elem)
            return
        if ntype == "OBJR":
            return
        tag = inherited_tag
        elem = inherited_elem
        s = node.get("S")
        if s is not None:
            c = canon(str(pdf.resolve(s)))
            if c in _MEANINGFUL:
                tag = c
            if c in _PARA_ELEMS:
                # a fresh INSTANCE id per paragraph-level element node —
                # two sibling /P elements get distinct ids even though
                # their tag is identical (decideBreak structId)
                next_elem[0] += 1
                elem = next_elem[0]
        pg = node.get("Pg")
        pgn = pg.num if isinstance(pg, Ref) else inherited_pg
        k = node.get("K")
        if k is not None:
            walk(k, tag, pgn, elem, depth + 1)

    try:
        walk(st.get("K"), None, None, None)
    except Exception:
        return ({}, {}) if with_elems else {}
    return (out, out_elems) if with_elems else out
