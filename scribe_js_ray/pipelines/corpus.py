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
    Shuffle key = (band, band_key); the text never crosses the exchange.

    Bucket membership is collected with a combinable list aggregate (one
    groupby shuffle, map-side combined) instead of per-group pandas calls
    — thousands of tiny ``map_groups`` invocations were the bottleneck."""
    from ray.data.aggregate import AggregateFn

    bands = ds.map_batches(_minhash_bands_batch, batch_format="pyarrow")

    collect_ids = AggregateFn(
        init=lambda k: [],
        accumulate_row=lambda acc, row: acc + [row["doc_id"]],
        merge=lambda a, b: a + b,
        name="doc_ids",
    )
    buckets = bands.groupby(["band", "band_key"]).aggregate(collect_ids)

    def pairs_of_buckets(t: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        seen = set()
        for ids in t["doc_ids"].to_pylist():
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    p = (ids[i], ids[j])
                    if p not in seen:  # in-block dedup before the shuffle
                        seen.add(p)
                        out_a.append(p[0])
                        out_b.append(p[1])
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
        })

    pairs = buckets.map_batches(pairs_of_buckets, batch_format="pyarrow")
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


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (verification layer over LSH candidates)


def _ngram_set(text: str, n: int = 3) -> set:
    toks = _NONALNUM_RE.sub(" ", (text or "").lower()).split()
    if len(toks) < n:
        return {tuple(toks)} if toks else set()
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard_pairs(ds, threshold: float = 0.8, n: int = 3):
    """Near-dup pairs by exact n-gram Jaccard, LSH-pruned: MinHash+LSH
    proposes candidates (no quadratic scan), then each candidate pair is
    verified with the true Jaccard of token n-gram sets.  The doc texts
    needed for verification are fetched via a broadcast id→text map
    (ray.put once, read per task — documents table is the small side of
    this join at verification time because candidates reference only the
    docs that collided)."""
    import ray

    candidates = minhash_duplicate_pairs(ds)

    # Broadcast the text column once (id→text); at 100 TB this becomes a
    # shuffle join of candidates against documents on doc_id — candidates
    # are tiny, so a broadcast of the *candidate* ids into a documents
    # scan would be the scale path.  Here the docs table fits the store.
    texts_ref = ray.put({
        d: t for batch in ds.iter_batches(batch_size=4096,
                                          batch_format="pyarrow")
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist())})

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a_ids = batch["doc_a"].to_pylist()
        b_ids = batch["doc_b"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for a, b in zip(a_ids, b_ids):
            sa, sb = _ngram_set(texts.get(a), n), _ngram_set(texts.get(b), n)
            if not sa and not sb:
                continue
            j = len(sa & sb) / (len(sa | sb) or 1)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return candidates.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup + ANN variants


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def emb_near_dup_pairs(ds, threshold: float = 0.95):
    """Exact embedding-cosine near-dup: per-batch matmul against a
    broadcast normalized matrix of the full (small-side) table — the
    blocked all-pairs pattern: each task computes one B×N strip, so the
    N×N similarity matrix never materializes.  ray.put once; tasks read
    zero-copy from the object store."""
    import ray

    # Materialize the broadcast side once (ids + normalized matrix).
    ids = []
    vecs = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids += batch["vec_id"].to_pylist()
        vecs.append(np.array(batch["embedding"].to_pylist(),
                             dtype=np.float64))
    all_ids = np.array(ids, dtype=np.int64)
    all_mat = _norm_rows(np.vstack(vecs))
    side_ref = ray.put((all_ids, all_mat))

    def strip(batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch["vec_id"], dtype=np.int64)
        bmat = _norm_rows(np.array(batch["embedding"].to_pylist(),
                                   dtype=np.float64))
        oids, omat = ray.get(side_ref)
        sims = bmat @ omat.T  # B×N strip
        rows, cols = np.nonzero(sims >= threshold)
        a = bids[rows]
        b = oids[cols]
        keep = a < b  # dedupe mirrored pairs + self-pairs
        return pa.table({
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
        })

    return ds.map_batches(strip, batch_format="pyarrow") \
        .sort(["vec_a", "vec_b"])


_N_HYPERPLANES = 12


def _hyperplanes(dim: int) -> np.ndarray:
    return np.random.RandomState(777).randn(_N_HYPERPLANES, dim)


def emb_lsh_buckets(ds, dim: int = 64):
    """SimHash-style LSH bucketing for embeddings: sign pattern under
    random hyperplanes → bucket key.  The scale path for near-dup /
    ANN: shuffle key = bucket, candidates verified in-bucket."""
    planes = _hyperplanes(dim)

    def bucket(batch: pa.Table) -> pa.Table:
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        keys = np.packbits(signs, axis=1)[:, :2]
        key_int = (keys[:, 0].astype(np.int64) << 8) | keys[:, 1]
        return pa.table({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(key_int, pa.int64()),
        })

    return ds.map_batches(bucket, batch_format="pyarrow")


def knn_top_k_ivf(ds, query_vec, k: int = 10, n_cells: int = 16,
                  n_probe: int = 4, dim: int = 64):
    """IVF-style ANN: coarse centroids from a deterministic grid of the
    hyperplane signs (no training pass needed at test scale; k-means at
    cluster scale), search only the n_probe cells nearest the query.
    Scale path: cells are the partition key; the query probes a fixed
    fraction of the corpus instead of all of it."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    planes = np.random.RandomState(4242).randn(n_cells, dim)
    planes = _norm_rows(planes)
    q_sims = planes @ qn
    probe_cells = set(np.argsort(-q_sims)[:n_probe].tolist())

    def score(batch: pa.Table) -> pa.Table:
        mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        matn = _norm_rows(mat)
        cells = np.argmax(matn @ planes.T, axis=1)
        mask = np.isin(cells, list(probe_cells))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = matn[mask] @ qn
        ids = np.asarray(batch["vec_id"], dtype=np.int64)[mask]
        order = np.argsort(-sims)[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "sim": pa.array(sims[order], pa.float64()),
        })

    topk = ds.map_batches(score, batch_format="pyarrow")
    return topk.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# extra text analysis: BPE-ish tokens, rolling-hash fingerprint


_BPE_RE = re.compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")


def add_bpe_token_counts(batch: pa.Table) -> pa.Table:
    """BPE-style pre-tokenizer count: letter runs, ≤3-digit number chunks,
    single punctuation marks (GPT-2-pretokenizer-shaped regex)."""
    texts = batch["text"].to_pylist()
    counts = [len(_BPE_RE.findall(t or "")) for t in texts]
    return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))


_ROLL_BASE = np.uint64(1000003)
_ROLL_MOD64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def add_rolling_fingerprint(batch: pa.Table, window: int = 16) -> pa.Table:
    """Document fingerprint via rolling polynomial hash (winnowing-style):
    min of window hashes over the byte stream — robust to local edits,
    deterministic, vectorized with numpy cumulative products."""
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        if len(data) < window:
            digest = hashlib.blake2b(bytes(data), digest_size=8).digest()
            out.append(int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF)
            continue
        # hash of window i = sum(data[i+j] * base^(w-1-j)) mod 2^64
        base = int(_ROLL_BASE)
        powers = np.array(
            [pow(base, window - 1 - j, 1 << 64) for j in range(window)],
            dtype=np.uint64)
        n_win = len(data) - window + 1
        strides = np.lib.stride_tricks.sliding_window_view(data, window)
        hashes = (strides.astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64)
        # winnow: take min hash (document-level sketch value)
        out.append(int(hashes.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "roll_fp": pa.array(out, pa.int64()),
    })


# ---------------------------------------------------------------------------
# font/char metrics aggregation (SURVEY A3: calcCharMetricsFromPages analog)


def font_metrics_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-document partial: parse the hOCR payload, accumulate per-font
    char-width observations normalized by line x-height (the map-side half
    of /root/reference/js/fontStatistics.js:19-113's grouped aggregate).
    Emits one row per (font, style) with count/sum — combinable."""
    from ..stages.hocr import parse_hocr_page

    fonts, styles, counts, sums = [], [], [], []
    acc: dict[tuple, list] = {}
    for payload in batch["html"].to_pylist():
        try:
            page, _ = parse_hocr_page(
                payload.decode("utf-8", "replace"), 0)
        except (ValueError, AttributeError):
            continue
        for line in page.lines:
            x_h = line.x_height or 0
            if not x_h:
                continue
            for w in line.words:
                family = w.style.font or "Default"
                style = ("bold" if w.style.bold else
                         "italic" if w.style.italic else "normal")
                width = (w.bbox.right - w.bbox.left) / max(len(w.text), 1)
                key = (family, style)
                slot = acc.setdefault(key, [0, 0.0])
                slot[0] += 1
                slot[1] += width / x_h
    for (family, style), (n, s) in acc.items():
        fonts.append(family)
        styles.append(style)
        counts.append(n)
        sums.append(s)
    return pa.table({
        "font": pa.array(fonts, pa.string()),
        "style": pa.array(styles, pa.string()),
        "n_obs": pa.array(counts, pa.int64()),
        "sum_rel_width": pa.array(sums, pa.float64()),
    })


def font_char_metrics(pages_ds):
    """Corpus-wide grouped aggregate: per-(font,style) mean char width
    relative to x-height.  Partial combine inside map_batches, ONE small
    groupby over (font,style) — never over raw observations."""
    from ray.data.aggregate import Sum

    partial = pages_ds.map_batches(font_metrics_partial_batch,
                                   batch_format="pyarrow")
    agg = partial.groupby(["font", "style"]).aggregate(
        Sum("n_obs", alias_name="n_obs"),
        Sum("sum_rel_width", alias_name="sum_rel_width"))

    def finish(t: pa.Table) -> pa.Table:
        mean = pc.divide(t["sum_rel_width"],
                         pc.cast(t["n_obs"], pa.float64()))
        return t.append_column("mean_rel_width", mean) \
            .drop_columns(["sum_rel_width"])

    return agg.map_batches(finish, batch_format="pyarrow")
