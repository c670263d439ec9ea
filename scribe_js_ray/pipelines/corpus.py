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


def add_clean_text(batch: pa.Table) -> pa.Table:
    """Rule-based text cleaning: strip ASCII control chars (keeping the
    \\t \\n \\r \\f whitespace family for the collapse step), collapse
    whitespace runs to single spaces, trim.  Both regex passes run in
    Arrow's RE2 — the SAME engine DuckDB uses — so the oracle is
    bit-exact by construction (character classes kept ASCII-explicit;
    never \\s, whose Python/RE2 semantics differ — CLAUDE.md)."""
    t = batch["text"]
    t = pc.replace_substring_regex(
        t, r"[\x00-\x08\x0b\x0e-\x1f\x7f]", "")
    t = pc.replace_substring_regex(t, r"[ \t\n\r\f]+", " ")
    t = pc.utf8_trim(t, " ")
    out = batch.append_column("clean_text", t)
    return out.append_column("n_clean_chars",
                             pc.cast(pc.utf8_length(t), pa.int64()))


# PII patterns in ASCII-explicit RE2 (same engine in Arrow and DuckDB,
# so the SQL oracle is bit-exact by construction — never \s/\w whose
# Python semantics differ).  The sentinel replacement runs email →
# ipv4 → ssn in that order; the ipv4 pattern would otherwise also
# consume the dotted quad inside a scrubbed email domain.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def _pii_seeded_text(batch: pa.Table) -> pa.Array:
    """The synthetic corpus carries no PII, so the query SEEDS
    deterministic doc_id-derived spans (email on doc_id%3==0, IPv4 on
    %4==0, SSN on %5==0) before scrubbing — the SQL oracle applies the
    identical seeding, so the detection/redaction logic is verified on
    non-trivial data.  All construction is Arrow-vectorized."""
    did = batch["doc_id"]
    text = pc.cast(batch["text"], pa.string())
    ds = pc.cast(did, pa.string())
    empty = pa.nulls(len(batch), pa.string())
    empty = pc.fill_null(empty, "")

    def gate(mod, parts):
        joined = pc.binary_join_element_wise(*parts, "")
        return pc.if_else(
            pc.equal(_mod_arr(did, mod), pa.scalar(0, pa.int64())),
            joined, empty)

    lit = (lambda s: pa.array([s] * len(batch), pa.string()))
    email = gate(3, [lit(" user"), ds, lit("@example.org")])
    oct4 = pc.cast(pc.add(_mod_arr(did, 200), pa.scalar(1, pa.int64())),
                   pa.string())
    ip = gate(4, [lit(" host 10.0.0."), oct4, lit("")])
    ssn = gate(5, [
        lit(" ssn "),
        pc.cast(pc.add(_mod_arr(did, 900), pa.scalar(100, pa.int64())),
                pa.string()),
        lit("-"),
        pc.cast(pc.add(_mod_arr(did, 90), pa.scalar(10, pa.int64())),
                pa.string()),
        lit("-"),
        pc.cast(pc.add(_mod_arr(did, 9000),
                       pa.scalar(1000, pa.int64())), pa.string()),
    ])
    return pc.binary_join_element_wise(text, email, ip, ssn, "")


def _mod_arr(a, m: int):
    a = pc.cast(a, pa.int64())
    return pc.subtract(a, pc.multiply(
        pc.divide(a, pa.scalar(m, pa.int64())),
        pa.scalar(m, pa.int64())))


def add_pii_scrub(batch: pa.Table) -> pa.Table:
    """PII detection + redaction — the pre-training scrub stage every
    large text corpus runs before the tokenizer: per-document match
    counts for email / IPv4 / SSN-shaped spans and the redacted text
    (sentinel tokens), plus its md5 so the oracle hash covers the full
    scrubbed surface without shipping long strings twice."""
    text = _pii_seeded_text(batch)
    n_email = pc.cast(pc.count_substring_regex(text, _PII_EMAIL),
                      pa.int64())
    scrubbed = pc.replace_substring_regex(text, _PII_EMAIL, "<EMAIL>")
    n_ipv4 = pc.cast(pc.count_substring_regex(scrubbed, _PII_IPV4),
                     pa.int64())
    scrubbed = pc.replace_substring_regex(scrubbed, _PII_IPV4, "<IP>")
    n_ssn = pc.cast(pc.count_substring_regex(scrubbed, _PII_SSN),
                    pa.int64())
    scrubbed = pc.replace_substring_regex(scrubbed, _PII_SSN, "<SSN>")
    md5s = [hashlib.md5((t or "").encode()).hexdigest()
            for t in scrubbed.to_pylist()]
    out = batch.append_column("n_email", n_email)
    out = out.append_column("n_ipv4", n_ipv4)
    out = out.append_column("n_ssn", n_ssn)
    return out.append_column("scrub_md5", pa.array(md5s, pa.string()))


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
    """Heuristic language ID: script detection (first decisive non-ASCII
    char wins: han→chi_sim, cyrillic→rus) + English stopword rate.

    Oracle-checked bit-exact: tokenization uses DuckDB-compatible
    semantics — trim spaces only (SQL ``trim()``), split on RE2's
    ``\\s`` class ``[\\t\\n\\f\\r ]+`` (no ``\\x0b``), ``lower()`` safe
    because stopword hits are pure-ASCII tokens."""
    from ..functions.textnorm import calc_lang
    texts = batch["text"].to_pylist()
    preds = []
    for t in texts:
        t = t or ""
        script = calc_lang(t)
        if script != "eng":
            preds.append(script)
            continue
        tokens = _WS_SPLIT_RE.split(t.lower().strip(" "))
        hits = sum(1 for tok in tokens
                   if tok.strip(".,!?;:\"'()") in _EN_STOPWORDS)
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


def _minhash_sig(text: str, cache: dict | None = None) -> np.ndarray:
    """64-perm MinHash signature.  Base hash = top 4 bytes of md5 (NOT
    blake2b) so the DuckDB oracle can reproduce every signature bit:
    sig_j = min over shingles of (a_j·h + b_j) mod (2^31-1), with the
    (a, b) constants interpolated into the SQL (see __ray_entry__).
    ``cache`` memoizes shingle→hash across a batch: boilerplate-heavy
    corpora repeat shingles across documents, and the md5 calls are the
    dominant CPU cost of the dedup suite (VERDICT r3 #5).

    Returns ``None`` for an empty shingle set (token-less text): such
    docs carry no content to near-dup on, and banding them (the old
    all-zeros signature) would pair every punctuation-only doc with
    every other — and diverge from the SQL oracle, which emits no
    signature rows for them."""
    sh = _shingles(text)
    if not sh:
        return None
    if cache is None:
        cache = {}
    vals = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        v = cache.get(s)
        if v is None:
            v = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
            cache[s] = v
        vals[i] = v
    # fully vectorized k×n in uint64 (a < 2^31, h < 2^32 → a·h < 2^63).
    prods = (_MH_A[:, None] * vals[None, :] + _MH_B[:, None]) % _MERSENNE31
    return prods.min(axis=1).astype(np.int64)


def _minhash_bands_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_doc, out_band, out_key = [], [], []
    r = _MINHASH_K // _MINHASH_BANDS
    shingle_cache: dict = {}   # shingle→hash, shared across the batch
    sig_cache: dict = {}       # text→signature (exact dups are common)
    for doc_id, text in zip(doc_ids, texts):
        if text in sig_cache:
            sig = sig_cache[text]
        else:
            sig = _minhash_sig(text, shingle_cache)
            sig_cache[text] = sig
        if sig is None:  # token-less doc: no signature, no candidates
            continue
        for b in range(_MINHASH_BANDS):
            band = sig[b * r:(b + 1) * r]
            # decimal-string key (not raw bytes) so the oracle's
            # md5(v0||'|'||v1||...) reproduces it exactly
            key = hashlib.md5(
                "|".join(str(int(v)) for v in band).encode()).hexdigest()
            out_doc.append(doc_id)
            out_band.append(b)
            out_key.append(key)
    return pa.table({
        "doc_id": pa.array(out_doc, pa.int64()),
        "band": pa.array(out_band, pa.int32()),
        "band_key": pa.array(out_key, pa.string()),
    })


_LSH_BUCKET_CAP = 128


def minhash_duplicate_pairs(ds, bucket_cap: int = _LSH_BUCKET_CAP):
    """MinHash+LSH near-dup candidates: shingle → 64-perm signature →
    16-band bucketing → per-bucket pair emission → distinct pairs.
    Shuffle key = (band, band_key); the text never crosses the exchange.

    Pair emission happens inside ``map_groups`` (one vectorized call per
    bucket — r1's per-row ``AggregateFn`` list-append was O(n²) Python).
    Hot buckets (boilerplate-heavy corpora collapse thousands of docs
    into one band key) are capped: above ``bucket_cap`` members, each doc
    links only to the bucket minimum — O(n) star pairs that preserve the
    connected component for dedup instead of an unbounded O(n²) blowup."""
    bands = ds.map_batches(_minhash_bands_batch, batch_format="pyarrow")

    def pairs_of_bucket(t: pa.Table) -> pa.Table:
        ids = sorted(set(t["doc_id"].to_pylist()))
        out_a, out_b = [], []
        if len(ids) > bucket_cap:
            m = ids[0]
            out_a = [m] * (len(ids) - 1)
            out_b = ids[1:]
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
        })

    pairs = bands.groupby(["band", "band_key"]) \
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
    # Distinct across bands (a true pair collides in many bands).
    from ray.data.aggregate import Count
    return pairs.groupby(["doc_a", "doc_b"]) \
        .aggregate(Count(alias_name="n_bands")) \
        .select_columns(["doc_a", "doc_b"])


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over token md5s (md5 rather than blake2b so the
    DuckDB oracle can reproduce the exact bits: per-bit majority vote of
    the top-8 md5 bytes, MSB = bit 63)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = []
    cache: dict = {}  # token → ±1 bit row, shared across the batch
    for text in texts:
        # strip-then-lower: keeps Python lower() == DuckDB lower() on
        # the surviving ASCII (U+0130 etc. removed first)
        toks = _NONALNUM_RE.sub(" ", text or "").lower().split()
        if not toks:
            out.append(0)
            continue
        # hash each UNIQUE token once (natural text repeats tokens
        # heavily; the per-occurrence md5 loop was the dedup suite's
        # dominant CPU cost) — vote = Σ bits·count, bit-identical to
        # the per-occurrence sum.
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        rows = np.empty((len(uniq), 64), dtype=np.int64)
        for i, tok in enumerate(uniq):
            row = cache.get(tok)
            if row is None:
                h = hashlib.md5(tok.encode()).digest()[:8]
                row = np.unpackbits(
                    np.frombuffer(h, dtype=np.uint8)).astype(np.int64) * 2 - 1
                cache[tok] = row
            rows[i] = row
        acc = rows.T @ counts
        sim = int.from_bytes(np.packbits(acc > 0).tobytes(), "big")
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
        mat = _emb_matrix(batch["embedding"])
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


def _ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique 64-bit hashes of the doc's token n-grams — the set
    representation that crosses the shuffle (8 B/gram, never the text)."""
    toks = _NONALNUM_RE.sub(" ", (text or "").lower()).split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    arr = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "big") for g in grams),
        dtype=np.uint64, count=len(grams))
    return np.unique(arr)


def ngram_jaccard_pairs(ds, threshold: float = 0.8, n: int = 3,
                        broadcast_cap: int = 100_000):
    """Near-dup pairs by n-gram Jaccard, LSH-pruned: MinHash+LSH proposes
    candidates (no quadratic scan), then each candidate pair is verified
    with the true Jaccard of the docs' n-gram hash sets.

    Fully distributed, candidate-pruned (r1 materialized the whole
    documents table on the driver; the first r2 cut hashed EVERY doc):
      1. candidate doc ids (distinct, tiny) semi-join the documents
         table via ``hash_bucket_join`` — only colliding docs' text is
         read into the hash stage;
      2. per-candidate-doc n-gram hash sets (sorted uint64, 8 B/gram);
      3. a second bucket join attaches each doc's set to its exploded
         pair rows; groupby(pair) computes exact Jaccard.
    Non-candidate docs never ship text OR hashes across an exchange."""
    from ..functions.joins import hash_bucket_join

    # Materialize the small intermediates: each hash_bucket_join consumes
    # its inputs twice (schema probe + union), and Ray lazily re-executes
    # the WHOLE upstream DAG per consumer — without this the MinHash
    # banding runs 4x.  Candidates/hash-sets are collapsed outputs, far
    # smaller than the corpus, so the object store holds them fine.
    candidates = minhash_duplicate_pairs(ds).materialize()

    hash_list_t = pa.list_(pa.uint64())

    def explode(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        both = pa.concat_arrays([t["doc_a"].chunk(0), t["doc_b"].chunk(0)]) \
            if t.num_rows else pa.array([], pa.int64())
        doubled = pa.concat_tables([t, t])
        return pa.table({
            "doc_id": both,
            "doc_a": doubled["doc_a"],
            "doc_b": doubled["doc_b"],
        })

    exploded = candidates.map_batches(explode, batch_format="pyarrow") \
        .materialize()

    # Distinct candidate doc ids — the semi-join probe side.
    from ray.data.aggregate import Count
    cand_ids = exploded.groupby("doc_id") \
        .aggregate(Count(alias_name="__n")).select_columns(["doc_id"])

    docs_slim = ds.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    # Semi-join strategy: the candidate-id set is usually TINY after LSH
    # (dup pairs only) — broadcast it as a plain int64 array and filter
    # docs in place (no text crosses any exchange).  Only when the set
    # outgrows a broadcast does the bucket join take over (it shuffles
    # the text of matched buckets — still never the whole corpus per
    # task, the r1 failure mode).
    cand_ids = cand_ids.materialize()
    n_cand = cand_ids.count()

    def _jaccard(sa, sb):
        if not len(sa) and not len(sb):
            return None
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = len(sa) + len(sb) - inter
        return inter / (union or 1)

    def _round6(j: float) -> float:
        # DuckDB round() is half-AWAY-from-zero; Python round() is
        # half-to-even — emulate half-away so the oracle hash-matches
        # (j >= 0 here).
        import math
        return math.floor(j * 1e6 + 0.5) / 1e6

    if n_cand <= broadcast_cap:
        # broadcast_cap bounds the DRIVER-side hash map: ~100k candidate
        # docs x ~1k grams x 8 B ≈ 800 MB worst case — above that the
        # join path must run even though it pays more shuffle overhead.
        # Small candidate set (the common case): broadcast the ids,
        # filter+hash the colliding docs in place, broadcast the hash
        # sets, verify every pair in ONE map_batches — zero extra
        # shuffles (each all-to-all costs seconds of fixed overhead on
        # many-block datasets).
        import ray as _ray
        id_arr = np.sort(np.asarray(
            cand_ids.to_pandas()["doc_id"], dtype=np.int64))
        ids_ref = _ray.put(id_arr)

        def filter_and_hash(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"], dtype=np.int64)
            mask = np.isin(ids, _ray.get(ids_ref))
            t = t.filter(pa.array(mask))
            hs = [_ngram_hashes(x, n) for x in t["text"].to_pylist()]
            return pa.table({
                "doc_id": t["doc_id"],
                "hashes": pa.array([h.tolist() for h in hs], hash_list_t),
            })

        hashed = docs_slim.map_batches(
            filter_and_hash, batch_format="pyarrow").to_pandas()
        hash_map = {i: np.asarray(h, dtype=np.uint64)
                    for i, h in zip(hashed["doc_id"], hashed["hashes"])}
        map_ref = _ray.put(hash_map)
        empty64 = np.empty(0, dtype=np.uint64)

        def verify_pairs(t: pa.Table) -> pa.Table:
            hm = _ray.get(map_ref)
            out_a, out_b, out_j = [], [], []
            for a, b in zip(t["doc_a"].to_pylist(),
                            t["doc_b"].to_pylist()):
                j = _jaccard(hm.get(a, empty64), hm.get(b, empty64))
                if j is not None and j >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(_round6(j))
            return pa.table({
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            })

        return candidates.map_batches(verify_pairs, batch_format="pyarrow")

    # Scale path: candidate set too large to broadcast — semi-join the
    # documents table, hash matched docs, attach both sides' hash sets
    # with two bucket joins, verify a whole batch of pairs per call.
    cand_docs = hash_bucket_join(cand_ids, docs_slim, on="doc_id")

    def hash_docs(t: pa.Table) -> pa.Table:
        hs = [_ngram_hashes(x, n) for x in t["text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "hashes": pa.array([h.tolist() for h in hs], hash_list_t),
        })

    doc_hashes = cand_docs.map_batches(hash_docs, batch_format="pyarrow") \
        .materialize()
    hashes_a = doc_hashes.map_batches(
        lambda t: t.rename_columns(["doc_a", "hashes_a"]),
        batch_format="pyarrow")
    j1 = hash_bucket_join(candidates, hashes_a, on="doc_a").materialize()
    hashes_b = doc_hashes.map_batches(
        lambda t: t.rename_columns(["doc_b", "hashes_b"]),
        batch_format="pyarrow")
    j2 = hash_bucket_join(j1, hashes_b, on="doc_b")

    def verify(t: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b, ha, hb in zip(t["doc_a"].to_pylist(),
                                t["doc_b"].to_pylist(),
                                t["hashes_a"].to_pylist(),
                                t["hashes_b"].to_pylist()):
            j = _jaccard(np.asarray(ha or [], dtype=np.uint64),
                         np.asarray(hb or [], dtype=np.uint64))
            if j is not None and j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(_round6(j))
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup + ANN variants


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(col) -> np.ndarray:
    """list<float> / fixed_size_list<float> column → (n, dim) float64
    matrix without a Python-list round trip (flatten + reshape over the
    Arrow values buffer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), dim).astype(np.float64, copy=False)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64, copy=False)


def emb_near_dup_pairs(ds, threshold: float = 0.95):
    """Exact embedding-cosine near-dup: per-batch matmul against a
    broadcast normalized matrix of the full (small-side) table — the
    blocked all-pairs pattern: each task computes one B×N strip, so the
    N×N similarity matrix never materializes.

    The broadcast side is assembled INSIDE a Ray task from the dataset's
    block refs — the driver only ever holds an ObjectRef (r1 gathered the
    whole table into a driver-side dict).  ``emb_near_dup_lsh`` is the
    sub-quadratic path when the corpus outgrows a broadcast side."""
    import ray

    block_refs = ds.to_arrow_refs()

    @ray.remote
    def build_side(*blocks):
        ids = np.concatenate(
            [np.asarray(b["vec_id"], dtype=np.int64) for b in blocks])
        mat = np.vstack([_emb_matrix(b["embedding"]) for b in blocks])
        return ids, _norm_rows(mat)

    side_ref = build_side.remote(*block_refs)

    def strip(batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch["vec_id"], dtype=np.int64)
        bmat = _norm_rows(_emb_matrix(batch["embedding"]))
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


def emb_near_dup_lsh(ds, threshold: float = 0.95, n_bands: int = 8,
                     band_bits: int = 8, dim: int = 64,
                     bucket_cap: int = 4096):
    """Sub-quadratic embedding near-dup: sign-LSH banding (n_bands bands
    of band_bits hyperplanes each) proposes candidates; each bucket is
    verified with EXACT cosine inside ``map_groups``.  Shuffle key =
    (band, bucket); each vector ships its (dim)-float payload to its
    n_bands buckets — no broadcast side, no N² strip.  Precision is
    exact; recall is the LSH collision probability (≥1 of n_bands bands
    agreeing on all band_bits signs): ≫0.99 for cos≥0.95 pairs at these
    defaults, but it FALLS with the threshold (≈0.2 at cos≈0.42, where
    the per-bit agreement is only ~0.64) — at loose thresholds either
    raise n_bands / shrink band_bits or use the exact emb_near_dup_pairs
    path."""
    planes = np.random.RandomState(777).randn(n_bands * band_bits, dim)

    def bucket(batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch["embedding"])
        signs = (mat @ planes.T) > 0            # n × (bands*bits)
        signs = signs.reshape(len(mat), n_bands, band_bits)
        keys = np.packbits(signs, axis=2)[:, :, 0].astype(np.int64)
        n = len(mat)
        band_idx = np.repeat(np.arange(n_bands, dtype=np.int32)[None, :],
                             n, axis=0).ravel()
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        take = np.repeat(np.arange(n), n_bands)
        return pa.table({
            "band": pa.array(band_idx, pa.int32()),
            "bucket": pa.array(keys.ravel(), pa.int64()),
            "vec_id": batch["vec_id"].take(pa.array(take)),
            "embedding": emb.take(pa.array(take)),
        })

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["vec_id"], dtype=np.int64)
        if len(ids) < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})
        mat = _norm_rows(_emb_matrix(group["embedding"]))
        if len(ids) > bucket_cap:
            # Hot bucket (a degenerate all-similar corpus collapses into
            # one sign pattern): full n×n verify is O(n²) memory — link
            # members to the bucket minimum only (star pairs, O(n)),
            # preserving the connected component for dedup like the
            # MinHash hot-bucket cap.
            order = np.argsort(ids)
            ids, mat = ids[order], mat[order]
            sims = mat[1:] @ mat[0]
            hit = np.nonzero(sims >= threshold)[0] + 1
            return pa.table({
                "vec_a": pa.array(np.full(len(hit), ids[0]), pa.int64()),
                "vec_b": pa.array(ids[hit], pa.int64()),
            })
        sims = mat @ mat.T
        rows, cols = np.nonzero(sims >= threshold)
        a, b = ids[rows], ids[cols]
        keep = a < b
        return pa.table({
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
        })

    pairs = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["band", "bucket"]) \
        .map_groups(verify_bucket, batch_format="pyarrow")
    from ray.data.aggregate import Count
    return pairs.groupby(["vec_a", "vec_b"]) \
        .aggregate(Count(alias_name="n_bands")) \
        .select_columns(["vec_a", "vec_b"]) \
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
        mat = _emb_matrix(batch["embedding"])
        signs = (mat @ planes.T) > 0
        keys = np.packbits(signs, axis=1)[:, :2]
        key_int = (keys[:, 0].astype(np.int64) << 8) | keys[:, 1]
        return pa.table({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(key_int, pa.int64()),
        })

    return ds.map_batches(bucket, batch_format="pyarrow")


def _ivf_planes(n_cells: int, dim: int) -> np.ndarray:
    """Deterministic coarse centroids (unit rows; k-means at cluster
    scale would refine these — the partition/pruning mechanics are
    identical)."""
    return _norm_rows(np.random.RandomState(4242).randn(n_cells, dim))


_IVF_MARKER = "_IVF_DONE"
_IVF_CENTROIDS = "_centroids.parquet"


def train_ivf_centroids(ds, n_cells: int = 16, dim: int = 64,
                        sample: int = 65536, iters: int = 10) -> np.ndarray:
    """Spherical k-means (Lloyd) on a bounded sample — the faiss-style
    train-on-sample path: at corpus scale the trainer never sees more
    than ``sample`` vectors, then ONE full pass assigns everything.
    Deterministic: init = the fixed random planes, sample = the stream's
    first rows.  Empty cells keep their previous direction."""
    mats = []
    for b in ds.limit(sample).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            mats.append(_emb_matrix(b["embedding"]))
    cents = _ivf_planes(n_cells, dim).copy()
    if not mats:
        return cents
    x = _norm_rows(np.vstack(mats))
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _norm_rows(cents)
    return cents


def load_ivf_centroids(index_dir: str, n_cells: int,
                       dim: int) -> np.ndarray:
    """Centroids persisted WITH the index (probes must score cells with
    the exact centroids the build assigned by, or pruning silently
    probes the wrong partitions); fixed-plane fallback for pre-trained
    indexes."""
    import os

    import pyarrow.parquet as pq
    path = os.path.join(index_dir, _IVF_CENTROIDS)
    if not os.path.isfile(path):
        return _ivf_planes(n_cells, dim)
    t = pq.read_table(path)
    cents = _emb_matrix(t["centroid"])
    order = np.argsort(np.asarray(t["cell"], dtype=np.int64))
    return np.ascontiguousarray(cents[order])


def build_ivf_index(ds, index_dir: str, n_cells: int = 16, dim: int = 64,
                    train: bool = True):
    """One-time IVF index build: k-means-refine the coarse centroids on
    a sample (``train=False`` keeps the fixed random planes), assign
    every vector to its nearest centroid and write Parquet PARTITIONED
    BY cell.  The cell is thereby a physical partition key — probes read
    only their cells' files.  Centroids are persisted inside the index.

    The build is ATOMIC: it writes into a staging dir and renames it into
    place with a done-marker, so a crashed or concurrent build can never
    leave a half-index that probes silently trust (r2 review finding)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    planes = train_ivf_centroids(ds, n_cells, dim) if train \
        else _ivf_planes(n_cells, dim)

    def assign(batch: pa.Table) -> pa.Table:
        matn = _norm_rows(_emb_matrix(batch["embedding"]))
        cells = np.argmax(matn @ planes.T, axis=1)
        return batch.append_column(
            "cell", pa.array(cells.astype(np.int32), pa.int32()))

    parent = os.path.dirname(os.path.abspath(index_dir)) or "."
    staging = tempfile.mkdtemp(prefix=".ivf-build-", dir=parent)
    try:
        ds.map_batches(assign, batch_format="pyarrow") \
            .write_parquet(staging, partition_cols=["cell"])
        pq.write_table(pa.table({
            "cell": pa.array(range(n_cells), pa.int32()),
            "centroid": pa.array([row.tolist() for row in planes],
                                 pa.list_(pa.float64())),
        }), os.path.join(staging, _IVF_CENTROIDS))
        with open(os.path.join(staging, _IVF_MARKER), "w") as fh:
            fh.write(f"n_cells={n_cells} dim={dim}\n")
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir, ignore_errors=True)
        try:
            os.replace(staging, index_dir)
        except OSError:
            # Lost a rename race to a concurrent builder — its complete
            # index is equivalent; drop ours.
            shutil.rmtree(staging, ignore_errors=True)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return index_dir


def ivf_index_ready(index_dir) -> bool:
    import os
    return index_dir is not None and os.path.isfile(
        os.path.join(index_dir, _IVF_MARKER))


def knn_top_k_ivf(ds, query_vec, k: int = 10, n_cells: int = 16,
                  n_probe: int = 4, dim: int = 64,
                  index_dir: str | None = None):
    """IVF ANN with real partition pruning: vectors are laid out in a
    cell-partitioned Parquet index (one directory per coarse centroid);
    a query reads ONLY its n_probe nearest cells — n_probe/n_cells of
    the corpus leaves storage, instead of r1's full scan with a
    per-batch cell filter.  Pass ``index_dir`` to reuse a prebuilt
    index across queries (the amortized path; bench does this)."""
    import atexit
    import os
    import shutil
    import tempfile

    import ray.data as rd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    # Only a COMPLETE index (done-marker present) is trusted; anything
    # else — partial crash debris, an empty dir — is rebuilt atomically.
    if not ivf_index_ready(index_dir):
        if index_dir is None:
            index_dir = tempfile.mkdtemp(prefix="ivf-index-")
            # ad-hoc (uncached) indexes are reaped at process exit
            atexit.register(shutil.rmtree, index_dir, ignore_errors=True)
        build_ivf_index(ds, index_dir, n_cells=n_cells, dim=dim)

    # probe with the index's OWN centroids (k-means-trained at build)
    planes = load_ivf_centroids(index_dir, n_cells, dim)
    q_sims = planes @ qn
    probe_cells = np.argsort(-q_sims)[:n_probe].tolist()
    dirs = [os.path.join(index_dir, f"cell={c}") for c in probe_cells]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                       "sim": pa.array([], pa.float64())}))
    pruned = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    def score(batch: pa.Table) -> pa.Table:
        matn = _norm_rows(_emb_matrix(batch["embedding"]))
        sims = matn @ qn
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        order = np.argsort(-sims)[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "sim": pa.array(sims[order], pa.float64()),
        })

    topk = pruned.map_batches(score, batch_format="pyarrow")
    return topk.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# extra text analysis: BPE-ish tokens, rolling-hash fingerprint


# Explicit whitespace class = DuckDB RE2's \s ([\t\n\f\r ] — no \x0b),
# so the doc_bpe_tokens oracle reproduces counts bit-for-bit.
_BPE_RE = re.compile(
    r"[A-Za-z]+|[0-9]{1,3}|[^ \t\n\f\rA-Za-z0-9]")


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


# Explicit class to match DuckDB's RE2 \s, which is [\t\n\f\r ] ONLY —
# Python's re.ASCII \s additionally matches \x0b (vertical tab), so a
# document containing \x0b would diverge from the oracle.  trim(text)
# strips SPACES only, and the oracle measures nonspace chars over the
# UNtrimmed text.
_WS_SPLIT_RE = re.compile(r"[\t\n\f\r ]+")
_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")


def add_quality_filter(batch: pa.Table, min_words: int = 50,
                       max_words: int = 100_000,
                       min_avg_wlen: float = 3.0,
                       max_avg_wlen: float = 10.0,
                       min_alpha_frac: float = 0.8) -> pa.Table:
    """Gopher-style quality gate: word-count window, mean word length
    window, alphabetic-word fraction floor.  All ratios are exact
    int/int double divisions so the verdicts hash-match the SQL oracle
    bit-for-bit."""
    out_n, out_avg, out_alpha, out_keep = [], [], [], []
    for text in batch["text"].to_pylist():
        text = text or ""
        t = text.strip(" ")  # DuckDB trim() strips spaces only
        toks = _WS_SPLIT_RE.split(t)  # "" → [""] like regexp_split_to_array
        n_words = len(toks)
        n_nonspace = len(_WS_SPLIT_RE.sub("", text))
        n_alpha = sum(1 for w in toks if _HAS_ALPHA_RE.search(w))
        avg = n_nonspace / n_words
        alpha = n_alpha / n_words
        out_n.append(n_words)
        out_avg.append(avg)
        out_alpha.append(alpha)
        out_keep.append(min_words <= n_words <= max_words
                        and min_avg_wlen <= avg <= max_avg_wlen
                        and alpha >= min_alpha_frac)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(out_n, pa.int64()),
        "avg_word_len": pa.array(out_avg, pa.float64()),
        "alpha_frac": pa.array(out_alpha, pa.float64()),
        "keep": pa.array(out_keep, pa.bool_()),
    })


def connected_components(pairs_ds, max_iter: int = 15,
                         broadcast_cap: int = 5_000_000):
    """Distributed connected components over an edge list (doc_a, doc_b)
    by iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbours (one bucket join + one
    groupby-min per round), converging in O(diameter) rounds.  The
    classic dedup-clustering step that turns near-dup PAIRS into groups
    keyed by their minimum member."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..functions.joins import hash_bucket_join

    pairs = pairs_ds.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64())}))

    if n_pairs <= broadcast_cap:
        # Small edge list (the common case after LSH): a driver-side
        # union-find in O(E α(E)) beats paying 2 shuffles per
        # propagation round (each all-to-all costs seconds of fixed
        # overhead).  16 B/pair → the cap bounds driver memory at ~80 MB.
        df = pairs.to_pandas()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(df["doc_a"].to_numpy(), df["doc_b"].to_numpy()):
            a, b = int(a), int(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by smaller root so the cluster id is the minimum
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        nodes = sorted(set(map(int, df["doc_a"]))
                       | set(map(int, df["doc_b"])))
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster": pa.array([find(n) for n in nodes], pa.int64()),
        }))

    def to_edges(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        a = t["doc_a"].chunk(0) if t.num_rows else pa.array([], pa.int64())
        b = t["doc_b"].chunk(0) if t.num_rows else pa.array([], pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow") \
        .materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "label": t["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("src").aggregate(Min("label", alias_name="label")) \
        .materialize()

    from ray.data.aggregate import Sum
    prev_sum = None
    for _ in range(max_iter):
        joined = hash_bucket_join(edges, labels, on="src")

        def neighbor_min(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["dst"], "label": t["label"]}) \
                .group_by("src").aggregate([("label", "min")]) \
                .rename_columns(["src", "label"])

        labels = joined.map_batches(neighbor_min, batch_format="pyarrow") \
            .union(labels) \
            .groupby("src").aggregate(Min("label", alias_name="label")) \
            .materialize()
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        import warnings
        warnings.warn(
            f"connected_components hit max_iter={max_iter} without "
            "converging; components wider than that many hops are "
            "reported split", stacklevel=2)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "cluster"])

    return labels.map_batches(rename, batch_format="pyarrow") \
        .sort("doc_id")


def dup_clusters(ds, max_iter: int = 15):
    """MinHash near-dup pairs → connected-component cluster ids."""
    return connected_components(minhash_duplicate_pairs(ds),
                                max_iter=max_iter)


def dedup_keep_list(docs_ds, pairs_ds, drop_broadcast_cap: int = 5_000_000):
    """Near-dup dedup KEEP list: the canonical output of the whole dedup
    suite — from near-dup pairs, keep exactly one representative (the
    minimum doc_id) per connected component plus every unclustered doc.

    Shape: clusters from ``connected_components``, whose label IS the
    component's minimum member id (min-rooted union-find / min-label
    propagation), so the drops are simply members != label — no extra
    groupby; the DROP set (dup members minus representatives — a small
    fraction of the corpus by construction) broadcasts via ray.put and
    filters the docs stream with vectorized ``pc.is_in``.  Above ``drop_broadcast_cap`` drops,
    fall back to a hash-bucket anti join (same exchange as the join
    primitive) instead of broadcasting."""
    from ..functions.joins import BroadcastTable, hash_bucket_join

    clusters = connected_components(pairs_ds).materialize()

    def non_reps(t: pa.Table) -> pa.Table:
        return pa.table({"drop_id": t.filter(
            pc.not_equal(t["doc_id"], t["cluster"]))["doc_id"]})

    # cluster label IS the component's min member id (min-label
    # propagation / min-rooted union-find), so the representative needs
    # no extra groupby: members != label are exactly the drops.
    drops = clusters.map_batches(non_reps,
                                 batch_format="pyarrow").materialize()
    n_drop = drops.count()

    if n_drop <= drop_broadcast_cap:
        parts = list(drops.iter_batches(batch_format="pyarrow"))
        drop_tbl = pa.concat_tables(parts) if parts else \
            pa.table({"drop_id": pa.array([], pa.int64())})
        bc = BroadcastTable(drop_tbl)

        def keep(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["doc_id"],
                            value_set=bc.get()["drop_id"].combine_chunks())
            return t.filter(pc.invert(mask))

        return docs_ds.map_batches(keep, batch_format="pyarrow")

    # Huge drop set: anti join via the shared bucket exchange — left
    # outer join on the drop ids, keep rows with no match.
    tagged = drops.map_batches(
        lambda t: pa.table({"doc_id": t["drop_id"],
                            "__dropped": pa.array([True] * t.num_rows)}),
        batch_format="pyarrow")
    joined = hash_bucket_join(docs_ds, tagged, on="doc_id", how="left")

    def strip(t: pa.Table) -> pa.Table:
        # unmatched (kept) rows have a null __dropped from the left join
        return t.filter(pc.is_null(t["__dropped"])) \
            .drop_columns(["__dropped"])

    return joined.map_batches(strip, batch_format="pyarrow")


def add_repetition_signals(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 quality rules):
    characters inside duplicated lines vs total line characters, plus
    line counts — integer counters so the verdicts hash-match the SQL
    oracle bit-for-bit.  The classic boilerplate detector for web text
    (navigation bars and footers repeat verbatim line-for-line)."""
    from collections import Counter
    out_dup, out_tot, out_nl, out_ndl = [], [], [], []
    for text in batch["text"].to_pylist():
        lines = (text or "").split("\n")
        counts = Counter(lines)
        dup = sum(len(ln) * n for ln, n in counts.items() if n > 1)
        tot = sum(len(ln) * n for ln, n in counts.items())
        out_dup.append(dup)
        out_tot.append(tot)
        out_nl.append(len(lines))
        out_ndl.append(sum(n for n in counts.values() if n > 1))
    return pa.table({
        "doc_id": batch["doc_id"],
        "dup_line_chars": pa.array(out_dup, pa.int64()),
        "total_line_chars": pa.array(out_tot, pa.int64()),
        "n_lines": pa.array(out_nl, pa.int64()),
        "n_dup_lines": pa.array(out_ndl, pa.int64()),
    })


def add_topngram_signals(batch: pa.Table) -> pa.Table:
    """Gopher top-2-gram repetition: characters covered by the single
    most frequent token bigram vs total token characters (boilerplate
    phrases like 'click here' dominate junk pages).  Tie-break = highest
    count then lexicographically greatest bigram, reproduced exactly by
    the SQL oracle's padded-count string key."""
    from collections import Counter
    out_top, out_tot = [], []
    for text in batch["text"].to_pylist():
        # strip-then-lower: lowercasing AFTER removing non-ASCII keeps
        # Python's full-case lower() byte-identical to DuckDB's
        # simple-case lower() (U+0130 diverges the other way, review r3)
        toks = _NONALNUM_RE.sub(" ", text or "").lower().split()
        total = sum(len(t) for t in toks)
        top = 0
        if len(toks) >= 2:
            counts = Counter(toks[i] + " " + toks[i + 1]
                             for i in range(len(toks) - 1))
            bigram, n = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
            top = n * (len(bigram) - 1)
        out_top.append(top)
        out_tot.append(total)
    return pa.table({
        "doc_id": batch["doc_id"],
        "top_bigram_chars": pa.array(out_top, pa.int64()),
        "total_token_chars": pa.array(out_tot, pa.int64()),
    })


# ---------------------------------------------------------------------------
# benchmark decontamination (training-data hygiene: flag documents whose
# token n-grams overlap a held-out benchmark/eval set — the standard
# contamination check public pipelines run before training)


def _batch_gram_sets(batch: pa.Table, n: int) -> list[set]:
    """Distinct token n-grams per row.  Tokenizer parity with the SQL
    oracle: trim + RE2 ``\\s+`` split runs in Arrow — the same engine
    DuckDB uses — so gram strings are bit-identical on both sides."""
    toks_col = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch["text"]), r"\s+")
    out = []
    for toks in toks_col.to_pylist():
        if not toks or len(toks) < n or toks == [""]:
            out.append(set())
        else:
            out.append({" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)})
    return out


def benchmark_ngram_table(ds, n: int = 3, modulus: int = 50,
                          cap: int = 20_000_000) -> pa.Table:
    """Distinct n-grams of the held-out benchmark slice
    (``doc_id % modulus == 0`` stands in for an externally-supplied eval
    set — real decontamination benchmarks are small separate tables, MBs
    not corpus-sized, which is exactly why the broadcast path below is
    the scale-correct shape).  Per-batch distinct sets stream to the
    driver; ``cap`` guards driver memory (a few hundred MB of grams) —
    a larger benchmark would swap the membership test for a hash-bucket
    semi-join on gram hashes (functions/joins.py exchange)."""

    def grams_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((ids % modulus) == 0))
        gs: set = set()
        for s in _batch_gram_sets(sub, n):
            gs |= s
        return pa.table({"g": pa.array(sorted(gs), pa.large_string())})

    uniq: set = set()
    stream = ds.map_batches(grams_batch, batch_format="pyarrow")
    for b in stream.iter_batches(batch_format="pyarrow"):
        uniq.update(b["g"].to_pylist())
        if len(uniq) > cap:
            raise ValueError(
                f"benchmark gram set exceeds cap={cap}; use the "
                "hash-bucket semi-join fallback for corpus-sized sets")
    return pa.table({"g": pa.array(sorted(uniq), pa.large_string())})


_BENCH_SET_MEMO: dict[str, frozenset] = {}


def _bench_set(bc) -> frozenset:
    """Per-process memo of the broadcast gram table as a frozenset (the
    plasma read is zero-copy but set construction isn't — do it once
    per worker process, not once per batch).  Keyed by the ObjectRef id
    — stable across task deserializations and unique per benchmark
    (``id(bc)`` would be neither: a new object per task, and reusable
    after GC)."""
    key = bc._ref.hex()
    s = _BENCH_SET_MEMO.get(key)
    if s is None:
        s = frozenset(bc.get()["g"].to_pylist())
        _BENCH_SET_MEMO.clear()   # one benchmark live at a time
        _BENCH_SET_MEMO[key] = s
    return s


def decontaminate(ds, bench_bc, n: int = 3):
    """Per doc: ``n_grams`` = distinct token n-grams, ``n_contaminated``
    = how many of them appear in the broadcast benchmark set.  Integer
    outputs (stable value hashing); the contamination ratio and any
    drop threshold derive downstream.  Map-only — the benchmark rides
    the object store via ``BroadcastTable`` (ray.put once, read
    per-node), never the task closure."""

    def contam(batch: pa.Table) -> pa.Table:
        bench = _bench_set(bench_bc)
        sets_ = _batch_gram_sets(batch, n)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_grams": pa.array([len(s) for s in sets_], pa.int64()),
            "n_contaminated": pa.array(
                [sum(1 for g in s if g in bench) for s in sets_],
                pa.int64()),
        })

    return ds.map_batches(contam, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-corpus image dedup (composes the embedded-image extraction op
# with the dedup machinery: a 100 TB PDF corpus re-embeds the same
# logos/scan-backgrounds millions of times)


def _image_hash_batch(batch: pa.Table) -> pa.Table:
    """Per-image identity keys; the heavy ``data`` column DIES HERE —
    only (url, obj_num, 2 hashes) cross any downstream exchange.

    ``exact_key``: md5 of the converted payload bytes (byte-identical
    dup).  ``phash``: 64-bit average-hash over an 8×8 gray thumbnail
    (decode via the stdlib codecs; perceptual near-dup robust to
    re-encode).  Undecodable payloads get phash -1 and only participate
    in exact dedup."""
    import hashlib as _hl

    from ..stages.codecs import decode_image, resize_nearest, to_rgb

    urls = batch["url"].to_pylist()
    objs = batch["obj_num"].to_pylist()
    datas = batch["data"].to_pylist()
    exact, phash = [], []
    for data in datas:
        data = data or b""
        exact.append(_hl.md5(data).hexdigest())
        try:
            px = to_rgb(decode_image(data))
            thumb = resize_nearest(px, 8, 8).astype(np.float32)
            gray = thumb.mean(axis=2)
            bits = (gray > gray.mean()).reshape(-1)
            h = 0
            for b in bits:
                h = (h << 1) | int(b)
            if h >= 1 << 63:  # two's-complement into int64 range
                h -= 1 << 64
            phash.append(h)
        except Exception:
            phash.append(-1)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "obj_num": pa.array(objs, pa.int32()),
        "exact_key": pa.array(exact, pa.string()),
        "phash": pa.array(phash, pa.int64()),
    })


def image_dup_groups(images_ds):
    """Embedded-image Dataset (url, obj_num, data, ...) → duplicate
    groups: one row per (kind, key) with ≥2 members.

    kind='exact' groups byte-identical converted payloads; kind='phash'
    groups perceptually-identical 64-bit aHashes (catches re-encodes
    and solid fills the exact key misses).  Hash projection happens
    map-side, so the shuffle moves ~50 B/image regardless of payload
    size — the same discipline as doc exact dedup (md5 before the
    exchange)."""
    from ray.data.aggregate import AggregateFn, Count

    # Both the exact and the phash groupby consume `hashed`; without
    # materializing, each consumer re-executes the upstream pipeline —
    # every embedded image would be decoded/re-encoded TWICE.  The
    # pinned table is (url, obj_num, 2 hashes): ~50 B/image.
    hashed = images_ds.map_batches(_image_hash_batch,
                                   batch_format="pyarrow",
                                   batch_size=None).materialize()

    # Distinct-url tracking is capped so the aggregate state stays
    # bounded on a hot key (a logo in 10^8 docs): n_urls saturates at
    # the cap, n_copies stays exact via the built-in Count.
    url_cap = 1024

    def _acc(a, r):
        u = r["url"]
        return a if (len(a) >= url_cap or u in a) else a + [u]

    def _merge(a, b):
        return (a + [u for u in b if u not in a])[:url_cap]

    def groups_for(kind: str, key_col: str):
        src = hashed if kind == "exact" \
            else hashed.filter(expr="phash != -1")  # undecodable: no phash
        # State is a plain list<string> so every intermediate shuffle
        # block stays a native Arrow column (no pickle fallback).
        agg = src.groupby(key_col).aggregate(
            Count(),
            AggregateFn(init=lambda k: [],
                        accumulate_row=_acc,
                        merge=_merge,
                        finalize=len,
                        name="n_urls"))

        def finish(batch: pa.Table) -> pa.Table:
            keys = [str(k) for k in batch[key_col].to_pylist()]
            n = [int(x) for x in batch["count()"].to_pylist()]
            nu = [int(x) for x in batch["n_urls"].to_pylist()]
            t = pa.table({
                "kind": pa.array([kind] * len(keys), pa.string()),
                "key": pa.array(keys, pa.string()),
                "n_copies": pa.array(n, pa.int64()),
                "n_urls": pa.array(nu, pa.int64()),
            })
            return t.filter(pc.greater_equal(t["n_copies"], 2))

        return agg.map_batches(finish, batch_format="pyarrow")

    exact = groups_for("exact", "exact_key")
    near = groups_for("phash", "phash")
    return exact.union(near).sort(["kind", "key"])


# ---------------------------------------------------------------------------
# End-to-end curation funnel: the complete 100 TB pipeline in ONE chain


def curation_funnel(pages_ds):
    """pages → extract → lang-ID → quality gate → exact dedup → funnel.

    The full training-data curation chain as one streaming composition:
    extraction and the per-doc signals (language, Gopher quality) are
    fused into a single map stage (flags, not copies); the only
    all-to-all exchange is the dedup distinct-count, which moves
    (md5, partial count) pairs — never text.  Returns the funnel table
    (stage, n_docs) the operator of a 10^12-doc run watches."""
    import hashlib as _hl

    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from .extract import build_extract_pipeline

    extracted = build_extract_pipeline(pages_ds)

    def flags(batch: pa.Table) -> pa.Table:
        texts = batch["extracted_text"].to_pylist()
        errors = batch["error"].to_pylist()
        sub = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array([t or "" for t in texts],
                                         pa.string())})
        lang = add_lang_pred(sub)["lang_pred"].to_pylist()
        q = add_quality_filter(sub, min_words=30)["keep"].to_pylist()
        ok = [bool(t) and not e for t, e in zip(texts, errors)]
        return pa.table({
            "ok": pa.array(ok, pa.bool_()),
            "is_eng": pa.array([o and lg == "eng"
                                for o, lg in zip(ok, lang)], pa.bool_()),
            "keep_q": pa.array([o and lg == "eng" and k for o, lg, k
                                in zip(ok, lang, q)], pa.bool_()),
            "text_hash": pa.array(
                [_hl.md5((t or "").encode()).hexdigest() for t in texts],
                pa.string()),
        })

    # Two consumers (dedup chain + funnel totals) read `flagged`; an
    # unmaterialized Dataset re-runs its WHOLE upstream plan per
    # consumer, i.e. the extraction stage — the dominant cost — would
    # execute twice.  The materialized table is flags+hash only (~50 B/
    # doc; the text died inside `flags`), so pinning it is cheap.
    flagged = extracted.map_batches(flags, batch_format="pyarrow",
                                    batch_size=None).materialize()

    # n_deduped = number of distinct hashes among quality-kept docs —
    # the survivor count needs no representative materialization at
    # all: per-batch unique → groupby(hash) → per-block counts → sum
    # (the same projected-exchange shape as events_distinct_users).
    def batch_unique(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.field("keep_q"))
        return pa.table({"text_hash": pc.unique(
            keep["text_hash"].combine_chunks())})

    uniq = flagged.map_batches(batch_unique, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(Count(alias_name="_n"))

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    dedup_totals = uniq.map_batches(count_rows, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"))
    n_deduped = int(dedup_totals["n"]) if dedup_totals else 0

    def to_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_input": pa.array([batch.num_rows], pa.int64()),
            "n_extracted": pa.array(
                [int(pc.sum(batch["ok"]).as_py() or 0)], pa.int64()),
            "n_english": pa.array(
                [int(pc.sum(batch["is_eng"]).as_py() or 0)], pa.int64()),
            "n_quality": pa.array(
                [int(pc.sum(batch["keep_q"]).as_py() or 0)], pa.int64()),
        })

    totals = flagged.map_batches(to_counts, batch_format="pyarrow") \
        .aggregate(Sum("n_input", alias_name="n_input"),
                   Sum("n_extracted", alias_name="n_extracted"),
                   Sum("n_english", alias_name="n_english"),
                   Sum("n_quality", alias_name="n_quality"))
    stages = ["input", "extracted", "english", "quality", "deduped"]
    vals = [int(totals[f"n_{k}"] if totals else 0) for k in
            ("input", "extracted", "english", "quality")] + [n_deduped]
    return pd.DataFrame({"stage": stages, "n_docs": vals})


def image_near_dup_pairs(images_ds, max_hamming: int = 6):
    """Perceptual NEAR-dup image pairs: banded-phash LSH + Hamming
    verify — the MinHash-band discipline applied to the 64-bit aHash.

    The 64 hash bits split into ``max_hamming + 1`` bands; two images
    sharing ANY band value become a candidate pair.  By pigeonhole,
    ≤ ``max_hamming`` mismatched bits cannot poison every one of
    ``max_hamming + 1`` bands, so every pair within the contract
    distance IS generated as a candidate (exact recall up to the
    hot-bucket cap); candidates are then verified by exact Hamming
    distance.  Verification is full pairwise WITHIN a bucket — bucket
    size is bounded by the ``cap`` (512 → ≤131k popcounts, trivial),
    and the cap is the one honest recall bound: a degenerate band
    value shared by >cap images (e.g. the all-white thumbnail band)
    keeps only the first cap members, like the text LSH's star cap.
    Exchange traffic: (band_key, url, phash) triples — the pixel data
    died map-side in ``_image_hash_batch``."""
    from ray.data.aggregate import AggregateFn

    n_bands = min(max_hamming + 1, 64)
    # Split 64 bit positions into n_bands contiguous runs, widths as
    # even as possible (e.g. max_hamming=6 → 7 bands: one 10-bit, six
    # 9-bit).
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0)
              for i in range(n_bands)]
    shifts = [sum(widths[:i]) for i in range(n_bands)]

    hashed = images_ds.map_batches(_image_hash_batch,
                                   batch_format="pyarrow",
                                   batch_size=None) \
        .filter(expr="phash != -1")

    def bands(batch: pa.Table) -> pa.Table:
        # Vectorized (VERDICT r4 #5): numpy shift/mask over the int64
        # phash column; the band key is an int64 ``(band << 56) |
        # band_val`` (band widths are ≤ 32 bits whenever n_bands ≥ 2,
        # so the composite never collides across bands; the degenerate
        # single-band mode keys on the raw hash).  8-byte keys also
        # shrink the exchange vs the old per-row f-string loop.
        n = batch.num_rows
        ph = batch["phash"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hu = ph.view(np.uint64)
        uid = pc.binary_join_element_wise(
            pc.cast(batch["url"], pa.string()),
            pc.cast(batch["obj_num"], pa.string()), "#")
        keys = np.empty((n, n_bands), np.uint64)
        for b in range(n_bands):
            band_val = (hu >> np.uint64(shifts[b])) \
                & np.uint64((1 << widths[b]) - 1)
            keys[:, b] = band_val if n_bands == 1 \
                else (np.uint64(b) << np.uint64(56)) | band_val
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
        return pa.table({
            "band_key": pa.array(keys.reshape(-1).view(np.int64)),
            "img": pc.take(uid, idx),
            "phash": pa.array(np.repeat(ph, n_bands)),
        })

    cap = 512  # hot-bucket member cap (same rationale as the text LSH)

    # Aggregate state is a flat list<string> ("img\x00hash-hex") so every
    # intermediate shuffle block is a native Arrow column — a [str, int]
    # pair item trips ArrowConversionError and falls back to pickle.
    def _acc(a, r):
        if len(a) >= cap:
            return a
        item = f'{r["img"]}\x00{r["phash"] & 0xFFFFFFFFFFFFFFFF:016x}'
        return a + [item] if item not in a else a

    def _merge(a, b):
        out = list(a)
        for item in b:
            if len(out) >= cap:
                break
            if item not in out:
                out.append(item)
        return out

    buckets = hashed.map_batches(bands, batch_format="pyarrow") \
        .groupby("band_key").aggregate(AggregateFn(
            init=lambda k: [],
            accumulate_row=_acc,
            merge=_merge,
            finalize=lambda a: a,
            name="members"))

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        for members in batch["members"].to_pylist():
            # Full pairwise inside the (cap-bounded) bucket: a star
            # pattern would silently drop B–C pairs whose common
            # anchor A is far from both.
            ms = sorted({(m.split("\x00")[0], int(m.split("\x00")[1], 16))
                         for m in members})
            for i in range(len(ms) - 1):
                for j in range(i + 1, len(ms)):
                    d = bin((ms[i][1] ^ ms[j][1])
                            & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        out_a.append(ms[i][0])
                        out_b.append(ms[j][0])
                        out_d.append(d)
        return pa.table({
            "img_a": pa.array(out_a, pa.string()),
            "img_b": pa.array(out_b, pa.string()),
            "hamming": pa.array(out_d, pa.int64()),
        })

    pairs = buckets.map_batches(verify, batch_format="pyarrow")
    # same pair can surface from several bands: dedup on (a, b)
    from ray.data.aggregate import Min
    return pairs.groupby(["img_a", "img_b"]) \
        .aggregate(Min("hamming", alias_name="hamming")) \
        .sort(["img_a", "img_b"])


# ---------------------------------------------------------------------------
# Stratified deterministic sampling + distinctive key-term extraction


def _thr_hex(rate: float) -> str:
    """Sampling rate → 8-hex-digit gate threshold.  ONE builder feeds
    both the Ray gate and the SQL predicate so the two cannot drift
    (the doc_sample_stratified oracle's bit-exactness rests on it)."""
    return f"{min(int(rate * 16 ** 8), 16 ** 8 - 1):08x}"


def stratified_sample(docs_ds, rates: dict[str, float] | None = None,
                      default_rate: float = 0.5):
    """Deterministic per-stratum downsampling: keep a document when the
    first 8 hex chars of ``md5(str(doc_id))`` sort below the stratum's
    threshold — the standard rebalancing step before training (cap the
    dominant language, keep the tail).

    Map-only and embarrassingly parallel: no exchange, no RNG state, and
    the SAME gate is expressible in SQL
    (``substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '<hex>'``), so the
    sample is bit-reproducible across engines and re-runs — a resumed
    100 TB job re-selects the identical subset.  Rates are a tiny config
    dict (not data), so closure capture is fine."""
    rates = {"en": 0.125} if rates is None else rates
    thresholds = {lang: _thr_hex(r) for lang, r in rates.items()}
    default_thr = _thr_hex(default_rate)

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        keep = [hashlib.md5(str(i).encode()).hexdigest()[:8]
                < thresholds.get(lg, default_thr)
                for i, lg in zip(ids, langs)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs_ds.map_batches(gate, batch_format="pyarrow")


def stratified_sample_sql(rates: dict[str, float] | None = None,
                          default_rate: float = 0.5) -> str:
    """The DuckDB twin of :func:`stratified_sample`'s gate (shared
    threshold construction so the two can never drift)."""
    rates = {"en": 0.125} if rates is None else rates
    cases = " ".join(f"WHEN '{lang}' THEN '{_thr_hex(r)}'"
                     for lang, r in rates.items())
    return (f"CASE lang {cases} ELSE '{_thr_hex(default_rate)}' END"
            " > substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)")


def _tf_batch(batch: pa.Table) -> pa.Table:
    """Explode documents into distinct (doc_id, term, tf) rows with the
    oracle-paired tokenizer (strip non-alnum BEFORE lower, split on
    spaces — keeps Python full-case lower() == DuckDB simple-case
    lower(); review r3)."""
    from collections import Counter
    ids, terms, tfs = [], [], []
    for i, text in zip(batch["doc_id"].to_pylist(),
                       batch["text"].to_pylist()):
        toks = _NONALNUM_RE.sub(" ", text or "").lower().split()
        for term, tf in Counter(toks).items():
            ids.append(i)
            terms.append(term)
            tfs.append(tf)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "term": pa.array(terms, pa.string()),
                     "tf": pa.array(tfs, pa.int64())})


def doc_key_terms(docs_ds, k: int = 3, broadcast_cap: int = 2_000_000):
    """Top-``k`` distinctive terms per document: rank by term frequency
    (desc), then document frequency (asc — rarer wins ties), then term.
    Integer-only scoring keeps the ranking bit-reproducible in SQL
    (a float tf·idf would hash-diverge on libm ulps).

    Distributed shape: ONE tokenize pass explodes docs into distinct
    (doc_id, term, tf) rows (materialized — two consumers; the text
    column died map-side).  Document frequency is then a groupby(term)
    count over those already-distinct pairs (no second tokenize).  The
    df table is vocabulary-sized: below ``broadcast_cap`` rows it
    attaches via ray.put + ``pc.index_in`` (zero-copy, no exchange);
    above, fall back to a bucket-fused shuffle join on the term string
    — and for truly hot keys the salt discipline in
    ``functions/joins.py`` applies.  The final per-doc top-k runs in
    ``map_groups`` after a doc_id-keyed exchange of (doc_id, term, tf,
    df) — groups are document-sized, never vocabulary-sized."""
    import pandas as pd
    from ray.data.aggregate import Count

    from ..functions.joins import BroadcastTable

    tf = docs_ds.map_batches(_tf_batch, batch_format="pyarrow",
                             batch_size=None).materialize()
    # df has two consumers (count probe + broadcast/join) — without
    # materializing, the vocabulary groupby (this op's dominant
    # exchange) would execute once per consumer.
    df = tf.groupby("term").aggregate(Count(alias_name="df")) \
        .materialize()

    n_df = df.count()
    if n_df <= broadcast_cap:
        bc = BroadcastTable(pa.Table.from_pandas(df.to_pandas()))

        def attach(batch: pa.Table) -> pa.Table:
            dfs = bc.lookup(batch["term"], "term", "df")
            return batch.append_column("df", pc.cast(dfs, pa.int64()))

        joined = tf.map_batches(attach, batch_format="pyarrow")
    else:  # pragma: no cover - exercised only at real-corpus scale
        from ..functions.joins import hash_bucket_join

        def key_batch(batch: pa.Table) -> pa.Table:
            keys = [int.from_bytes(
                hashlib.md5(t.encode()).digest()[:8], "big") >> 1
                for t in batch["term"].to_pylist()]
            return batch.append_column("term_key",
                                       pa.array(keys, pa.int64()))

        joined = hash_bucket_join(
            tf.map_batches(key_batch, batch_format="pyarrow"),
            df.map_batches(key_batch, batch_format="pyarrow")
            .rename_columns({"term": "term_r"}),
            on="term_key").drop_columns(["term_key", "term_r"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tf", "df", "term"],
                          ascending=[False, True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = (g.index + 1).astype("int64")
        return g[["doc_id", "rank", "term", "tf", "df"]]

    return joined.groupby("doc_id").map_groups(topk, batch_format="pandas")


def domain_stats(docs_ds):
    """Per-source (domain) curation rollup: document count, distinct-text
    count (exact-dup mass), and quality-pass mass — the table a corpus
    operator uses to rank/block domains.

    Scale shape: text dies map-side (md5 + the Gopher keep flag are
    computed per batch); exchange 1 groups the (source, hash) pairs
    (distinct-text resolution), exchange 2 is source-keyed and tiny.
    Both groupbys move ~50 B/doc regardless of document size."""
    from ray.data.aggregate import Count, Max, Sum

    def prep(batch: pa.Table) -> pa.Table:
        keep = add_quality_filter(batch)["keep"]
        hashes = [hashlib.md5((t or "").encode()).hexdigest()
                  for t in batch["text"].to_pylist()]
        return pa.table({
            "source": batch["source"],
            "text_hash": pa.array(hashes, pa.string()),
            "keep": pc.cast(keep, pa.int64()),
        })

    per_text = docs_ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["source", "text_hash"]).aggregate(
            Count(alias_name="n_copies"),
            Max("keep", alias_name="keep"))

    def qmass(t: pa.Table) -> pa.Table:
        return t.append_column(
            "q_mass", pc.multiply(t["keep"], t["n_copies"]))

    return per_text.map_batches(qmass, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("n_copies", alias_name="n_docs"),
            Count(alias_name="n_distinct_texts"),
            Sum("q_mass", alias_name="n_quality")) \
        .sort("source")


def vocab_topk(docs_ds, k: int = 200):
    """Corpus-wide token vocabulary: the top-``k`` whitespace tokens by
    frequency with a deterministic (n DESC, token ASC) tie-break — the
    seed-vocabulary step of tokenizer training.

    Scale shape: each batch collapses to its UNIQUE tokens with partial
    counts (np.unique over the flattened Arrow token lists), so the one
    token-keyed exchange moves vocabulary mass, not corpus mass; the
    final sort runs over the merged vocabulary only."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        toks = pc.list_flatten(pc.split_pattern_regex(trimmed, r"\s+"))
        arr = toks.to_numpy(zero_copy_only=False)
        if len(arr):
            uniq, counts = np.unique(arr, return_counts=True)
            mask = uniq != ""
            uniq, counts = uniq[mask], counts[mask]
        else:
            uniq = np.empty(0, dtype=object)
            counts = np.empty(0, dtype=np.int64)
        return pa.table({
            "token": pa.array(uniq, pa.string()),
            "n_part": pa.array(counts, pa.int64()),
        })

    counts = docs_ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n_part", alias_name="n"))
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


def pack_sequences(docs_ds, budget_tokens: int = 2048,
                   n_shards: int = 256):
    """Greedy next-fit sequence packing: concatenate documents into
    training sequences of at most ``budget_tokens`` whitespace tokens —
    the batch-construction step of an LLM data pipeline.

    Global greedy packing is inherently sequential, so the scalable
    (and industry-standard) form packs WITHIN deterministic shards:
    shard = doc_id mod ``n_shards``, documents ordered by doc_id inside
    the shard, next-fit accumulation (a doc longer than the budget gets
    its own sequence).  The result is bit-reproducible regardless of
    block boundaries or execution order, and each shard packs in
    parallel after one doc-keyed exchange.  Output: one row per doc
    placement (shard, seq_id, doc_id, n_tokens, token_offset)."""
    import pandas as pd

    def prep(batch: pa.Table) -> pa.Table:
        t = add_token_counts(batch)
        shard = pc.cast(
            pc.bit_wise_and(batch["doc_id"], n_shards - 1)
            if (n_shards & (n_shards - 1)) == 0 else
            pc.subtract(batch["doc_id"],
                        pc.multiply(pc.divide(batch["doc_id"], n_shards),
                                    n_shards)), pa.int64())
        return pa.table({"shard": shard, "doc_id": batch["doc_id"],
                         "n_tokens": t["n_tokens"]})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, used = 0, 0
        for n in g["n_tokens"]:
            n = int(n)
            if used and used + n > budget_tokens:
                seq += 1
                used = 0
            seq_ids.append(seq)
            offsets.append(used)
            used += n
        g["seq_id"] = pd.Series(seq_ids, dtype="int64")
        g["token_offset"] = pd.Series(offsets, dtype="int64")
        return g[["shard", "seq_id", "doc_id", "n_tokens", "token_offset"]]

    return docs_ds.select_columns(["doc_id", "text"]) \
        .map_batches(prep, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact duplicate-span profile (the discovery half of exact-substring dedup)


def dup_span_profile(docs_ds, n: int = 8):
    """Corpus-wide exact duplicate n-gram span profile: every whitespace
    ``n``-gram that occurs more than once anywhere in the corpus, with
    its total occurrence count and distinct-document count — the
    discovery pass of exact-substring deduplication (the published
    suffix-array method of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", re-expressed as a
    shuffle-friendly n-gram profile).

    Distributed shape: n-grams explode MAP-SIDE with a per-batch Arrow
    ``group_by`` pre-aggregation, so the single gram-keyed exchange
    carries ONE (gram, doc_id, n_occ) row per distinct (gram, doc) —
    never the raw span stream (each document is one input row, so the
    per-batch group fully dedups the pair).  ``n_docs`` is then a plain
    Count and ``n_occurrences`` a Sum.  At 100 TB you'd key the
    exchange on a 128-bit gram hash and keep one representative string
    per group (same shape, smaller exchange); at oracle scale the gram
    string itself is the key so the profile is directly consumable."""
    from ray.data.aggregate import Count, Sum

    def explode(t: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        grams: list[str] = []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            w = (txt or "").strip(" ").split(" ")
            m = len(w) - n + 1
            if m <= 0:
                continue
            doc_ids.extend([did] * m)
            grams.extend(" ".join(w[i:i + n]) for i in range(m))
        pairs = pa.table({
            "gram": pa.array(grams, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })
        agg = pairs.group_by(["gram", "doc_id"]).aggregate(
            [("doc_id", "count")])
        return pa.table({
            "gram": agg["gram"],
            "doc_id": agg["doc_id"],
            "n_occ": pc.cast(agg["doc_id_count"], pa.int64()),
        })

    prof = docs_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("gram") \
        .aggregate(Sum("n_occ", alias_name="n_occurrences"),
                   Count(alias_name="n_docs"))

    def only_dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_occurrences"], 1))
        return pa.table({
            "gram": t["gram"],
            "n_occurrences": pc.cast(t["n_occurrences"], pa.int64()),
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
        })

    return prof.map_batches(only_dups, batch_format="pyarrow") \
        .sort(["n_occurrences", "gram"], descending=[True, False])


# Canon-key layout for exact-substring dedup: key = doc_id * BASE + pos.
# 20 bits of position ⇒ docs up to 1,048,575 whitespace tokens; a longer
# doc raises (at 100 TB widen to a 128-bit (doc, pos) pair — the shape
# is unchanged, only the key width).
_SPAN_POS_BASE = 1 << 20


def dedup_spans_apply(docs_ds, n: int = 8,
                      broadcast_cap: int = 2_000_000):
    """Apply pass of exact-substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    whitespace ``n``-gram occurrence that duplicates an occurrence seen
    earlier in the corpus loses its tokens; only the canonical
    occurrence — the globally FIRST, i.e. minimal (doc_id, position) —
    keeps them.  A token covered by ANY removed span is dropped;
    surviving tokens re-join with single spaces.  This is the
    remove-the-copies half whose discovery half is
    :func:`dup_span_profile`; together they are the n-gram re-expression
    of the reference suffix-array method.

    Output: one row per input doc — (doc_id, text_dedup, n_removed).

    Distributed shape: discovery reuses dup_span_profile's exchange —
    map-side per-(gram, doc) partials carrying (count, min-pos canon
    key), ONE gram-keyed groupby with Sum/Min finalize.  The duplicated
    grams (a corpus's dup-phrase vocabulary, typically ≪ corpus mass)
    broadcast as a {gram: canon_key} map via ray.put — ~2M entries ≈
    200 MB heap cap — and the apply runs as ONE map_batches over the
    untouched docs stream: zero extra exchanges, the text never moves.
    Above the cap the scale path runs instead: occurrence explode →
    gram-keyed map_groups emits non-canon (doc_id, kill_pos) pairs →
    doc-keyed collect of kill starts → hash-bucket LEFT join back to
    the docs (text crosses exactly one partitioned exchange; no driver
    materialization of anything corpus-sized)."""
    import ray as _ray
    from ray.data.aggregate import Min, Sum

    from scribe_js_ray.functions.joins import hash_bucket_join

    def _tokens(txt):
        return (txt or "").strip(" ").split(" ")

    def explode_partials(t: pa.Table) -> pa.Table:
        """Per-batch (gram, n_occ, min canon key) partials: group_by
        collapses repeated (gram, doc) occurrences before the shuffle
        (each doc is one row, so the batch group fully dedups)."""
        grams: list[str] = []
        keys: list[int] = []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            w = _tokens(txt)
            m = len(w) - n + 1
            if m <= 0:
                continue
            if len(w) >= _SPAN_POS_BASE:
                raise ValueError(
                    f"doc {did}: {len(w)} tokens exceeds the "
                    f"{_SPAN_POS_BASE - 1}-token canon-key width")
            base = did * _SPAN_POS_BASE
            grams.extend(" ".join(w[i:i + n]) for i in range(m))
            keys.extend(base + i for i in range(m))
        occ = pa.table({
            "gram": pa.array(grams, pa.string()),
            "key": pa.array(keys, pa.int64()),
        })
        agg = occ.group_by(["gram"]).aggregate(
            [("key", "count"), ("key", "min")])
        return pa.table({
            "gram": agg["gram"],
            "n_occ": pc.cast(agg["key_count"], pa.int64()),
            "min_key": agg["key_min"],
        })

    dup = docs_ds.map_batches(explode_partials, batch_format="pyarrow") \
        .groupby("gram") \
        .aggregate(Sum("n_occ", alias_name="n_total"),
                   Min("min_key", alias_name="canon_key"))

    def only_dups(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_total"], 1))
        return pa.table({
            "gram": t["gram"],
            "canon_key": pc.cast(t["canon_key"], pa.int64()),
        })

    dup = dup.map_batches(only_dups, batch_format="pyarrow").materialize()
    n_dup = dup.count()

    def _apply_doc(w: list[str], kill: np.ndarray):
        n_rm = int(kill.sum())
        if n_rm == 0:
            return " ".join(w), 0
        return " ".join(tok for tok, k in zip(w, kill) if not k), n_rm

    if n_dup <= broadcast_cap:
        # Common case: the dup-phrase vocabulary fits a broadcast map.
        dup_pd = dup.to_pandas()
        dup_map = dict(zip(dup_pd["gram"], dup_pd["canon_key"]))
        dup_ref = _ray.put(dup_map)

        def apply_batch(t: pa.Table) -> pa.Table:
            dm = _ray.get(dup_ref)
            ids = t["doc_id"].to_pylist()
            out_txt: list[str] = []
            out_rm: list[int] = []
            for did, txt in zip(ids, t["text"].to_pylist()):
                w = _tokens(txt)
                m = len(w) - n + 1
                kill = np.zeros(len(w), dtype=bool)
                base = did * _SPAN_POS_BASE
                for i in range(max(m, 0)):
                    ck = dm.get(" ".join(w[i:i + n]))
                    if ck is not None and ck != base + i:
                        kill[i:i + n] = True
                txt2, n_rm = _apply_doc(w, kill)
                out_txt.append(txt2)
                out_rm.append(n_rm)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text_dedup": pa.array(out_txt, pa.string()),
                "n_removed": pa.array(out_rm, pa.int64()),
            })

        return docs_ds.map_batches(apply_batch, batch_format="pyarrow")

    # Scale path: dup vocabulary too large to broadcast.  Re-explode
    # RAW occurrences (no collapse — every position is needed to kill
    # in-doc repeats) and let the gram-keyed groups decide canon
    # locally; only (doc_id, pos) kill pairs leave that exchange.
    def explode_occ(t: pa.Table) -> pa.Table:
        grams: list[str] = []
        keys: list[int] = []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            w = _tokens(txt)
            m = len(w) - n + 1
            if m <= 0:
                continue
            if len(w) >= _SPAN_POS_BASE:
                raise ValueError(
                    f"doc {did}: {len(w)} tokens exceeds the "
                    f"{_SPAN_POS_BASE - 1}-token canon-key width")
            base = did * _SPAN_POS_BASE
            grams.extend(" ".join(w[i:i + n]) for i in range(m))
            keys.extend(base + i for i in range(m))
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            "key": pa.array(keys, pa.int64()),
        })

    def emit_kills(g: pa.Table) -> pa.Table:
        keys = np.asarray(g["key"], dtype=np.int64)
        if keys.size < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        canon = keys.min()
        kill = keys[keys != canon]
        return pa.table({
            "doc_id": pa.array(kill // _SPAN_POS_BASE),
            "pos": pa.array(kill % _SPAN_POS_BASE),
        })

    kills = docs_ds.map_batches(explode_occ, batch_format="pyarrow") \
        .groupby("gram").map_groups(emit_kills, batch_format="pyarrow")

    def collect_starts(g: pa.Table) -> pa.Table:
        did = g["doc_id"][0].as_py()
        starts = sorted(g["pos"].to_pylist())
        return pa.table({
            "doc_id": pa.array([did], pa.int64()),
            "kill_starts": pa.array([starts], pa.list_(pa.int64())),
        })

    per_doc = kills.groupby("doc_id") \
        .map_groups(collect_starts, batch_format="pyarrow")

    docs_slim = docs_ds.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    joined = hash_bucket_join(docs_slim, per_doc, on="doc_id", how="left")

    def apply_joined(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_txt: list[str] = []
        out_rm: list[int] = []
        for txt, starts in zip(t["text"].to_pylist(),
                               t["kill_starts"].to_pylist()):
            w = _tokens(txt)
            kill = np.zeros(len(w), dtype=bool)
            for s in (starts or ()):
                kill[s:s + n] = True
            txt2, n_rm = _apply_doc(w, kill)
            out_txt.append(txt2)
            out_rm.append(n_rm)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text_dedup": pa.array(out_txt, pa.string()),
            "n_removed": pa.array(out_rm, pa.int64()),
        })

    return joined.map_batches(apply_joined, batch_format="pyarrow")


def bigram_topk(docs_ds, k: int = 200):
    """Corpus-wide top-``k`` adjacent token pairs by frequency — the
    first-merge-candidate step of BPE-style tokenizer training (and the
    collocation seed for phrase mining), with the same deterministic
    (n DESC, bigram ASC) tie-break as ``vocab_topk``.

    Scale shape: bigrams never span documents; each batch pairs tokens
    within rows via the list-offset buffers (no Python row loop) and
    collapses to UNIQUE bigrams with partial counts, so the one
    bigram-keyed exchange moves phrase-vocabulary mass, not corpus
    mass; the final sort runs over the merged vocabulary only."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offs = np.asarray(lists.offsets)
        flat = lists.values.to_numpy(zero_copy_only=False)
        base = offs[0]
        n = len(flat)
        grams = np.empty(0, dtype=object)
        if n >= 2:
            # a position starts a bigram unless it is some row's LAST
            # token (offsets mark row ends); empty tokens (blank docs
            # split to [""]) never pair because their row has length 1
            can_start = np.ones(n, dtype=bool)
            ends = offs[1:] - 1 - base
            ends = ends[ends >= 0]
            can_start[ends] = False
            can_start[n - 1] = False
            idx = np.nonzero(can_start)[0]
            if len(idx):
                lefts = flat[idx]
                rights = flat[idx + 1]
                ok = (lefts != "") & (rights != "")
                grams = np.char.add(np.char.add(
                    lefts[ok].astype(str), " "), rights[ok].astype(str))
        if len(grams):
            uniq, counts = np.unique(grams, return_counts=True)
        else:
            uniq = np.empty(0, dtype=object)
            counts = np.empty(0, dtype=np.int64)
        return pa.table({
            "bigram": pa.array(uniq.astype(object), pa.string()),
            "n_part": pa.array(counts, pa.int64()),
        })

    counts = docs_ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n_part", alias_name="n"))
    return counts.sort(["n", "bigram"], descending=[True, False]).limit(k)
