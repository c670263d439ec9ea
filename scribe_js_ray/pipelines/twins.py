"""Sequential oracle twins for the non-SQL-expressible pipelines.

Each twin recomputes a ``queries()`` result with PLAIN sequential
Python — the exact same per-batch functions the distributed pipeline
maps, applied to the whole input as ONE batch, no Ray anywhere — and
stages it to a fixed parquet path that the static ``oracle_sql()``
string reads back.  The oracle therefore proves DISTRIBUTED ≡
SEQUENTIAL for the complete pipeline: Ray's scheduling, batching,
shuffles and exchanges added, lost and corrupted nothing.  The
sequential per-document functions themselves are separately verified
byte-identical against the LIVE reference (``tests/test_ref_parity.py``
batteries run /root/reference/scribe.js under node), which closes the
evidence chain end-to-end.

Staging is gated to oracle scales: the driver's correctness gate runs
at sf0.01 (500 docs) and the pytest mirror at sf0.001 — above
``STAGE_MAX_DOCS`` the whole-corpus twins skip staging so bench runs at
sf0.1+ time only the distributed pipeline.  The fixed-sample twins
(64/32-doc surfaces) are always cheap and always stage.

Shared synthetic-input batch functions live here too so the distributed
query in ``__ray_entry__`` and its twin provably consume identical
inputs (both import THIS module's function).
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

STAGE_DIR = "/tmp/scribe_oracle_stage"
STAGE_MAX_DOCS = 2000  # whole-corpus twins stage only at oracle scales
N_SAMPLE_DOCS = 64     # fixed-sample surfaces (consensus, roundtrip, mm)
N_VIDEO_DOCS = 32


def _write_stage(name: str, table: pa.Table) -> str:
    os.makedirs(STAGE_DIR, exist_ok=True)
    path = f"{STAGE_DIR}/{name}.parquet"
    pq.write_table(table, path)
    return path


def _read_docs(sf_dir: str, columns, limit: int | None = None) -> pa.Table:
    """Driver-side sequential read of the documents table — the same
    rows, in the same file order, that ``ray.data.read_parquet(...)
    .limit(n)`` yields (single-file reads preserve row order)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=columns)
    return t.slice(0, limit) if limit is not None else t


# --------------------------------------------------------------------------
# Shared synthetic-input batch functions (distributed query AND twin)
# --------------------------------------------------------------------------

def consensus_layers_batch(batch: pa.Table) -> pa.Table:
    """documents → three hOCR layers per doc: base with an injected
    SAME-LENGTH typo ('z'*len so geometry is unchanged and the spatial
    vote of compareOCRModule's font-free path is exact) + two clean
    comparators (J1/J2 inputs)."""
    from ..sources.synth import hocr_from_text

    urls, layers, payloads = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        url = f"https://fix.test/doc/{doc_id:06d}"
        words = (text or "").split()
        if words:
            words = ["z" * len(words[0])] + words[1:]
        base = hocr_from_text(" ".join(words), doc_id)
        clean = hocr_from_text(text or "", doc_id)
        for layer, payload in ((0, base), (1, clean), (2, clean)):
            urls.append(url)
            layers.append(layer)
            payloads.append(payload)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "layer": pa.array(layers, pa.int32()),
        "html": pa.array(payloads, pa.binary()),
    })


def eval_corrupt_batch(batch: pa.Table) -> pa.Table:
    """documents → (text_a=one word corrupted, text_b=clean) eval pairs
    (A6 inputs; the corrupted index is doc_id mod word count)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    cand = []
    for i, t in zip(ids, texts):
        words = (t or "").split()
        if words:
            words[i % len(words)] = "corrupted"
        cand.append(" ".join(words))
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_a": pa.array(cand, pa.string()),
        "text_b": pa.array([t or "" for t in texts], pa.string()),
    })


def scribe_roundtrip_batch(batch: pa.Table) -> pa.Table:
    """Per-doc .scribe round-trip (S10, import.js:168-365): parse →
    write segmented+gzip .scribe → re-parse → text byte-compare."""
    from ..sources.synth import hocr_from_text
    from ..stages.emit import write_text
    from ..stages.hocr import parse_hocr_page
    from ..stages.scribe_fmt import parse_scribe, write_scribe

    ids, n_pages, match = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        page, _ = parse_hocr_page(
            hocr_from_text(text or "x", doc_id).decode(), 0)
        before = write_text([page])
        blob = write_scribe([page], segmented=True, gzip_out=True)
        after = write_text(parse_scribe(blob))
        ids.append(doc_id)
        n_pages.append(1)
        match.append(before == after)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_pages": pa.array(n_pages, pa.int32()),
        "match": pa.array(match, pa.bool_()),
    })


def pdf_subset_scrub_batch(batch: pa.Table) -> pa.Table:
    """Per-doc page-subset + metadata-scrub rebuild (subsetPdf.js:1056,
    stripMetadataPdf:1105): typeset 3 pages, keep [0,2] with scrub,
    re-parse, byte-compare kept text."""
    from ..sources.synth_pdf import _make_pdf, _Typesetter
    from ..stages.pdf import parse_pdf_document
    from ..stages.pdf.subset import subset_pdf

    def text_of(page):
        return " ".join(w.text for ln in page.lines for w in ln.words)

    ids, n_out, match = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        words = [w for w in (text or "x").split()
                 if w.isascii() and w.isprintable()][:360] or ["x"]
        streams = []
        for i in range(3):
            ts = _Typesetter()
            ts.flow(words[i::3][:120] or ["x"])
            streams.append(ts.stream())
        src = _make_pdf(streams, {"F1": "Helvetica"})
        out = subset_pdf(src, [0, 2], scrub=True)
        src_pages, _ = parse_pdf_document(src)
        out_pages, _ = parse_pdf_document(out)
        want = [text_of(src_pages[0]), text_of(src_pages[2])]
        got = [text_of(p) for p in out_pages]
        ids.append(doc_id)
        n_out.append(len(out_pages))
        match.append(got == want)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_pages_out": pa.array(n_out, pa.int32()),
        "match": pa.array(match, pa.bool_()),
    })


def synth_images_batch(batch: pa.Table) -> pa.Table:
    """documents → deterministic REAL PNG/BMP/GIF/JPEG payloads keyed
    off doc_id (multimodal decode inputs)."""
    from ..sources.synth import synth_image_payload

    ids = batch["doc_id"].to_pylist()
    return pa.table({
        "image_id": pa.array(ids, pa.int64()),
        "image": pa.array([synth_image_payload(d) for d in ids],
                          pa.binary()),
    })


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """documents → deterministic 16-bit PCM WAV clips keyed off doc_id."""
    from ..sources.synth import synth_audio_payload

    ids = batch["doc_id"].to_pylist()
    return pa.table({
        "audio_id": pa.array(ids, pa.int64()),
        "audio": pa.array([synth_audio_payload(d) for d in ids],
                          pa.binary()),
    })


def synth_video_batch(batch: pa.Table) -> pa.Table:
    """documents → deterministic MPNG clips keyed off doc_id."""
    from ..sources.synth import synth_video_payload

    ids = batch["doc_id"].to_pylist()
    return pa.table({
        "video_id": pa.array(ids, pa.int64()),
        "video": pa.array([synth_video_payload(d) for d in ids],
                          pa.binary()),
    })


def audio_features_long(batch: pa.Table) -> pa.Table:
    """(audio_id, sample_rate, features fixed-list) → long form
    (audio_id, sample_rate, feat_idx, value): scalar float32 rows the
    SQL oracle can sort and hash (list columns aren't orderable in the
    comparator)."""
    import numpy as np

    feats = batch.column("features")
    n = len(feats)
    dim = feats.type.list_size
    vals = np.asarray(feats.combine_chunks().flatten(), dtype=np.float32)
    aid = batch["audio_id"].combine_chunks().to_numpy(zero_copy_only=False)
    sr = batch["sample_rate"].combine_chunks().to_numpy(
        zero_copy_only=False)
    return pa.table({
        "audio_id": pa.array(np.repeat(aid.astype(np.int64), dim),
                             pa.int64()),
        "sample_rate": pa.array(np.repeat(sr, dim).astype(np.int32),
                                pa.int32()),
        "feat_idx": pa.array(
            np.tile(np.arange(dim, dtype=np.int32), n), pa.int32()),
        "value": pa.array(vals, pa.float32()),
    })


# --------------------------------------------------------------------------
# Twins: sequential recomputation + staging
# --------------------------------------------------------------------------

def stage_extract_corpus(sf_dir: str, emit_format: str = "text",
                         stage_name: str = "extract_corpus") -> bool:
    """Sequential twin of the FLAGSHIP extraction pipeline: the same
    ``documents_to_pages_batch`` + ``_extract_batch`` functions the
    distributed query maps, applied once over the whole corpus."""
    from ..pipelines.extract import _extract_batch
    from ..sources.synth import documents_to_pages_batch

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    if docs.num_rows > STAGE_MAX_DOCS:
        return False
    pages = documents_to_pages_batch(docs)
    out = _extract_batch(pages, emit_format=emit_format)
    cols = ["url", "extracted_text", "n_pages", "doc_type",
            "payload_kind"] if emit_format == "text" \
        else ["url", "extracted_text"]
    _write_stage(stage_name, out.select(cols))
    return True


def stage_ocr_consensus(sf_dir: str) -> bool:
    """Sequential twin of the distributed consensus vote: same layer
    builder, same per-group function (consensus.consensus_of_group),
    grouped with a plain pandas groupby instead of Ray's exchange."""
    import pandas as pd

    from .consensus import consensus_of_group

    docs = _read_docs(sf_dir, ["doc_id", "text"], limit=N_SAMPLE_DOCS)
    layers = consensus_layers_batch(docs).to_pandas()
    parts = [consensus_of_group(g) for _, g in layers.groupby("url")]
    out = pd.concat(parts, ignore_index=True)[
        ["url", "n_high", "n_replaced"]]
    _write_stage("ocr_consensus", pa.Table.from_pandas(
        out, preserve_index=False))
    return True


def stage_eval_word_accuracy(sf_dir: str) -> bool:
    """Sequential twin of the A6 partial+final eval reduce: same
    ``eval_layers_batch`` partials, plain int sums for the final."""
    from .evaluate import _COUNTERS, eval_layers_batch

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    if docs.num_rows > STAGE_MAX_DOCS:
        return False
    partial = eval_layers_batch(eval_corrupt_batch(docs))
    import pyarrow.compute as pc
    row = {c: pa.array([int(pc.sum(partial[c]).as_py() or 0)], pa.int64())
           for c in _COUNTERS}
    total = row["total"][0].as_py()
    correct = row["correct"][0].as_py()
    row["word_accuracy"] = pa.array(
        [(correct / total) if total else 0.0], pa.float64())
    _write_stage("eval_word_accuracy", pa.table(row))
    return True


def stage_font_char_metrics(sf_dir: str) -> bool:
    """Sequential twin of the grouped char-metrics aggregate (A3/T5,
    fontStatistics.js:19-113): same per-batch partial, pandas groupby
    sum + the same float64 division for the final mean."""
    from .corpus import font_metrics_partial_batch
    from ..sources.synth import documents_to_pages_batch

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    if docs.num_rows > STAGE_MAX_DOCS:
        return False
    partial = font_metrics_partial_batch(
        documents_to_pages_batch(docs)).to_pandas()
    agg = partial.groupby(["font", "style"], as_index=False).agg(
        n_obs=("n_obs", "sum"), sum_rel_width=("sum_rel_width", "sum"))
    agg["mean_rel_width"] = agg["sum_rel_width"] / agg["n_obs"]
    out = agg[["font", "style", "n_obs", "mean_rel_width"]]
    _write_stage("font_char_metrics", pa.Table.from_pandas(
        out, preserve_index=False))
    return True


def stage_scribe_session_roundtrip(sf_dir: str) -> bool:
    docs = _read_docs(sf_dir, ["doc_id", "text"], limit=N_SAMPLE_DOCS)
    _write_stage("scribe_session_roundtrip", scribe_roundtrip_batch(docs))
    return True


def stage_pdf_subset_scrub(sf_dir: str) -> bool:
    docs = _read_docs(sf_dir, ["doc_id", "text"], limit=N_SAMPLE_DOCS)
    _write_stage("pdf_subset_scrub", pdf_subset_scrub_batch(docs))
    return True


def stage_mm_image_features(sf_dir: str) -> bool:
    """Sequential twin of the image decode pipeline: same DecodeImages
    callable (stdlib PNG/BMP/GIF/JPEG decoders), one batch."""
    from ..stages.multimodal import DecodeImages

    docs = _read_docs(sf_dir, ["doc_id"], limit=N_SAMPLE_DOCS)
    decoded = DecodeImages()(synth_images_batch(docs))
    _write_stage("mm_image_features", decoded.select(
        ["image_id", "format", "width", "height"]))
    return True


def stage_mm_audio_features(sf_dir: str) -> bool:
    """Sequential twin of the audio decode+features pipeline.  The
    AudioFeatures kernel is per-row (row-wise reductions + rfft along
    axis=1), so one whole-sample batch computes bit-identical float32s
    to the distributed batch_size=64 run."""
    from ..stages.multimodal import AudioFeatures, DecodeAudio

    docs = _read_docs(sf_dir, ["doc_id"], limit=N_SAMPLE_DOCS)
    feats = AudioFeatures()(DecodeAudio()(synth_audio_batch(docs)))
    _write_stage("mm_audio_features", audio_features_long(
        feats.select(["audio_id", "sample_rate", "features"])))
    return True


def stage_mm_video_frames(sf_dir: str) -> bool:
    """Sequential twin of the video frame-sampling flat-map."""
    from ..stages.multimodal import SampleVideoFrames

    docs = _read_docs(sf_dir, ["doc_id"], limit=N_VIDEO_DOCS)
    frames = SampleVideoFrames(n_frames=4)(synth_video_batch(docs))
    _write_stage("mm_video_frames", frames.select(
        ["video_id", "frame_idx", "src_frame"]))
    return True
