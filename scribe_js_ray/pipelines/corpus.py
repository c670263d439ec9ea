"""Large-scale training-data corpus operators over the documents/embeddings
tables: deduplication (exact, MinHash+LSH, SimHash), similarity search,
text analysis (lang-ID, quality features, token counts, fingerprints).

Every operator is a lazy Ray Data pipeline builder: vectorized batch
functions, partial aggregation before shuffles, per-batch top-k before the
final small sort (SURVEY §2 D5/A10/O5 patterns; scale notes inline).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# text analysis


_TOKEN_RE = re.compile(r"\s+")
_NONALNUM_RE = re.compile(r"[^a-zA-Z0-9]")
_PUNCT_RE = re.compile(r"[^.!?,;:]")

_EN_STOPWORDS = frozenset((
    "the of and to in is was for that with his this they from have not had "
    "her she which were can there an all when who been would their one will "
    "them more about out up into than its on at by as be are or it he a i"
).split())


def add_token_counts(batch: pa.Table) -> pa.Table:
    """n_tokens = whitespace-separated token count (vectorized)."""
    # pc.split_pattern_regex + list_value_length stays in Arrow.
    trimmed = pc.utf8_trim_whitespace(batch["text"])
    tokens = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(tokens)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def add_fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 over the lowercased alphanumeric skeleton
    (SQL-expressible → oracle-checked)."""
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5(_NONALNUM_RE.sub("", t or "").lower().encode())
           .hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def add_quality_features(batch: pa.Table) -> pa.Table:
    """Integer quality counters (floats avoided for stable value hashing)."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    trimmed = pc.utf8_trim_whitespace(text)
    n_words = pc.cast(
        pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")),
        pa.int64())
    punct = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, r"[^.!?,;:]", "")), pa.int64())
    upper = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, r"[^A-Z]", "")), pa.int64())
    out = batch.append_column("q_chars", n_chars)
    out = out.append_column("q_words", n_words)
    out = out.append_column("q_punct", punct)
    out = out.append_column("q_upper", upper)
    return out


def add_lang_pred(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: script detection + English stopword rate.
    (Not SQL-expressible → rows-only correctness check.)"""
    from ..functions.textnorm import calc_lang
    texts = batch["text"].to_pylist()
    preds = []
    for t in texts:
        t = t or ""
        script = calc_lang(t)
        if script != "eng":
            preds.append(script)
            continue
        tokens = _TOKEN_RE.split(t.lower().strip())
        if not tokens:
            preds.append("und")
            continue
        hits = sum(1 for tok in tokens if tok.strip(".,!?;:\"'()") in _EN_STOPWORDS)
        preds.append("eng" if hits / len(tokens) >= 0.1 else "und")
    return batch.append_column("lang_pred", pa.array(preds, pa.string()))


# ---------------------------------------------------------------------------
# dedup


def _text_hash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_hash": pa.array(hashes, pa.string()),
    })


def exact_dedup_survivors(ds):
    """Exact dedup: hash text → hash-partitioned groupby → first (min
    doc_id) per group.  The shuffle moves only (doc_id, hash) — never the
    text payload (scale rule: project before the exchange)."""
    from ray.data.aggregate import Min
    hashed = ds.map_batches(_text_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


_MINHASH_K = 64
_MINHASH_BANDS = 16  # r = 4 rows per band
_MERSENNE31 = np.uint64((1 << 31) - 1)
_rng = np.random.RandomState(12345)
_MH_A = _rng.randint(1, (1 << 31) - 1, size=_MINHASH_K).astype(np.uint64)
_MH_B = _rng.randint(0, (1 << 31) - 1, size=_MINHASH_K).astype(np.uint64)


def _shingles(text: str, k: int = 5):
    t = _NONALNUM_RE.sub(" ", (text or "").lower())
    toks = t.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _minhash_sig(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.zeros(_MINHASH_K, dtype=np.int64)
    base = np.array(
        [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(),
                        "big") for s in sh],
        dtype=np.uint64)
    # sig_j = min over shingles of (a_j·h + b_j) mod p — fully vectorized
    # k×n in uint64 (a·h < 2^62, no overflow).
    prods = (_MH_A[:, None] * base[None, :] + _MH_B[:, None]) % _MERSENNE31
    return prods.min(axis=1).astype(np.int64)


def _minhash_bands_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_doc, out_band, out_key = [], [], []
    r = _MINHASH_K // _MINHASH_BANDS
    for doc_id, text in zip(doc_ids, texts):
        sig = _minhash_sig(text)
        for b in range(_MINHASH_BANDS):
            band = sig[b * r:(b + 1) * r]
            key = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
            out_doc.append(doc_id)
            out_band.append(b)
            out_key.append(key)
    return pa.table({
        "doc_id": pa.array(out_doc, pa.int64()),
        "band": pa.array(out_band, pa.int32()),
        "band_key": pa.array(out_key, pa.string()),
    })


def minhash_duplicate_pairs(ds):
    """MinHash+LSH near-dup candidates: shingle → 64-perm signature →
    16-band bucketing → per-bucket pair emission → distinct pairs.
    Shuffle key = (band, band_key); the text never crosses the exchange."""
    import pandas as pd

    bands = ds.map_batches(_minhash_bands_batch, batch_format="pyarrow")

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    pairs = bands.groupby(["band", "band_key"]).map_groups(
        pairs_of_group, batch_format="pandas")
    # Distinct across bands (a true pair collides in many bands).
    from ray.data.aggregate import Count
    return pairs.groupby(["doc_a", "doc_b"]) \
        .aggregate(Count(alias_name="n_bands")) \
        .select_columns(["doc_a", "doc_b"])


def _simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = []
    for text in texts:
        toks = _NONALNUM_RE.sub(" ", (text or "").lower()).split()
        acc = np.zeros(64, dtype=np.int64)
        for tok in toks:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        sim = 0
        for bit in (acc > 0).astype(np.int64):
            sim = (sim << 1) | int(bit)
        out.append(sim - (1 << 64) if sim >= (1 << 63) else sim)  # int64 wrap
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "simhash": pa.array(out, pa.int64()),
    })


def simhash_signatures(ds):
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search


def knn_top_k(ds, query_vec, k: int = 10):
    """Brute-force cosine top-k: per-batch numpy matmul against the (tiny,
    closure-captured) query, per-batch top-k, then a final small sort —
    the full table is never globally sorted.  At cluster scale the query
    matrix is ray.put once; an IVF bucket variant shards by coarse
    centroid (later round)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def score(batch: pa.Table) -> pa.Table:
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        order = np.argsort(-sims)[:k]
        return pa.table({
            "vec_id": pa.array(np.asarray(batch["vec_id"])[order]),
            "sim": pa.array(sims[order], pa.float64()),
        })

    topk = ds.map_batches(score, batch_format="pyarrow")
    return topk.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
