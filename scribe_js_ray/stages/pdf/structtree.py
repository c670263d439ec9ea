"""Tagged-PDF structure tree → per-page MCID role maps (SURVEY M21/J4).

Analog of the reference's struct-tree lookup maps
(/root/reference/js/pdf/parsePdfDoc.js structTag/mcid word signals and
analyzeLayout.js's structRole overlay): walk /StructTreeRoot, resolve
/RoleMap aliases, and record for every marked-content ID the nearest
enclosing SEMANTIC element tag (H1-H6/H, P, LI/Lbl/LBody, BlockQuote,
TD/TH/Table, Figure, TOC/TOCI, Caption).

Output: ``{page_obj_num: {mcid: tag}}`` — the caller joins on the page's
object number and each word's mcid.
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


def parse_struct_tree(pdf) -> dict:
    root = pdf.resolve(pdf.trailer.get("Root"))
    if not isinstance(root, dict):
        return {}
    st = pdf.resolve(root.get("StructTreeRoot"))
    if not isinstance(st, dict):
        return {}
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

    def record(page_num, mcid, tag):
        if page_num is None or mcid is None:
            return
        out.setdefault(page_num, {})[mcid] = tag

    def walk(node, inherited_tag, inherited_pg, depth=0):
        if depth > 64:
            return
        node = pdf.resolve(node)
        if isinstance(node, list):
            for kid in node:
                walk(kid, inherited_tag, inherited_pg, depth + 1)
            return
        if isinstance(node, (int, float)):
            record(inherited_pg, int(node), inherited_tag)
            return
        if not isinstance(node, dict):
            return
        ntype = str(node.get("Type") or "")
        if ntype == "MCR":
            pg = node.get("Pg")
            pgn = pg.num if isinstance(pg, Ref) else inherited_pg
            mcid = pdf.resolve(node.get("MCID"))
            if isinstance(mcid, (int, float)):
                record(pgn, int(mcid), inherited_tag)
            return
        if ntype == "OBJR":
            return
        tag = inherited_tag
        s = node.get("S")
        if s is not None:
            c = canon(str(pdf.resolve(s)))
            if c in _MEANINGFUL:
                tag = c
        pg = node.get("Pg")
        pgn = pg.num if isinstance(pg, Ref) else inherited_pg
        k = node.get("K")
        if k is not None:
            walk(k, tag, pgn, depth + 1)

    try:
        walk(st.get("K"), None, None)
    except Exception:
        return {}
    return out
