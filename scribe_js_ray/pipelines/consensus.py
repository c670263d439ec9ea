"""Distributed OCR-layer consensus: the corpus-level form of SURVEY J1/J2.

Two (or more) OCR layers of the same corpus are zip-joined on ``url`` with
ONE groupby shuffle — each group holds every layer's payload for one
document — and ``build_consensus_page`` votes word-by-word inside the
group (modifyOCR.js:266-360 semantics).  The payloads cross the exchange
once; at 100 TB the layers would be pre-partitioned by url-hash so the
groupby is shuffle-free.
"""

from __future__ import annotations

import pandas as pd

from ..stages.combine import build_consensus_page
from ..stages.hocr import parse_hocr_page
from ..stages.layout import analyze_layout
from ..stages.emit import write_text_spans


def _parse_first_page(payload: bytes):
    try:
        page, _ = parse_hocr_page(payload.decode("utf-8", "replace"), 0)
        return page
    except ValueError:
        return None


def consensus_of_group(g: pd.DataFrame) -> pd.DataFrame:
    """One url's layers → one consensus row (module-level so the
    sequential oracle twin in pipelines/twins.py applies the SAME
    function under a plain pandas groupby)."""
    g = g.sort_values("layer")
    base_page = None
    comps = []
    for _, row in g.iterrows():
        page = _parse_first_page(row["html"])
        if row["layer"] == 0:
            base_page = page
        else:
            comps.append(page)
    if base_page is None:
        return pd.DataFrame({
            "url": pd.Series([], dtype="object"),
            "consensus_text": pd.Series([], dtype="object"),
            "n_high": pd.Series([], dtype="int64"),
            "n_replaced": pd.Series([], dtype="int64"),
        })
    stats = build_consensus_page(base_page,
                                 [c for c in comps if c is not None])
    analyze_layout([base_page], pdf_type="ocr")
    text, _ = write_text_spans([base_page], reflow_text=True,
                               drop_furniture=True)
    return pd.DataFrame({
        "url": [g["url"].iloc[0]],
        "consensus_text": [text],
        "n_high": [stats["high"]],
        "n_replaced": [stats["replaced"]],
    })


def consensus_over_layers(layers_ds):
    """layers_ds columns: url, layer (0=base, 1..=comparators), html.
    Returns per-url consensus text + vote stats."""
    return layers_ds.groupby("url").map_groups(
        consensus_of_group, batch_format="pandas")
