"""Text-level evaluation metrics (SURVEY §2 A6/J3, text-diff variant).

The reference's eval pipeline renders words against a binarized raster and
scores pixel overlap (compareOCRModule.js) — raster-free here by design
(SURVEY J3: "eval stats port as text-level diff instead").  Counter shape
follows calcEvalStatsDoc (/root/reference/js/recognizeConvert.js:139-160):
total/correct/incorrect/missed/extra per document, reduced corpus-wide
with the canonical partial+final pattern (`reduceEvalMetrics`
miscUtils.js:361 → ``ds.aggregate(Sum(...))``).

Per-document scoring: aligned word-token comparison via difflib
SequenceMatcher (longest-common-subsequence alignment of the two token
streams — the text analog of the reference's word-by-word spatial match).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pyarrow as pa


def eval_text_pair(text_a: str, text_b: str) -> dict:
    """Compare candidate (a) against reference (b); returns counters."""
    a = (text_a or "").split()
    b = (text_b or "").split()
    sm = SequenceMatcher(a=a, b=b, autojunk=False)
    correct = sum(tr.size for tr in sm.get_matching_blocks())
    stats = {
        "total": len(b),
        "correct": correct,
        "incorrect": 0,
        "missed": 0,
        "extra": 0,
    }
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "replace":
            n = min(i2 - i1, j2 - j1)
            stats["incorrect"] += n
            if (i2 - i1) > n:
                stats["extra"] += (i2 - i1) - n
            if (j2 - j1) > n:
                stats["missed"] += (j2 - j1) - n
        elif tag == "delete":
            stats["extra"] += i2 - i1
        elif tag == "insert":
            stats["missed"] += j2 - j1
    return stats


_COUNTERS = ("total", "correct", "incorrect", "missed", "extra")


def eval_layers_batch(batch: pa.Table, col_a: str = "text_a",
                      col_b: str = "text_b") -> pa.Table:
    """Per-row partial: text pair → counter columns."""
    cols = {c: [] for c in _COUNTERS}
    for ta, tb in zip(batch[col_a].to_pylist(), batch[col_b].to_pylist()):
        st = eval_text_pair(ta, tb)
        for c in _COUNTERS:
            cols[c].append(st[c])
    out = batch.drop_columns([col_a, col_b])
    for c in _COUNTERS:
        out = out.append_column(c, pa.array(cols[c], pa.int64()))
    return out


def reduce_eval_metrics(ds):
    """Corpus-level final reduce: Sum each counter (A6 partial+final)."""
    from ray.data.aggregate import Sum

    agg = ds.aggregate(*[Sum(c, alias_name=c) for c in _COUNTERS])
    total = agg["total"] or 0
    correct = agg["correct"] or 0
    agg["word_accuracy"] = (correct / total) if total else 0.0
    return agg
