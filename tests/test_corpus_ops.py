"""Unit tests for the extended corpus operators: n-gram Jaccard dedup,
embedding near-dup, IVF ANN, BPE-ish tokens, rolling fingerprint."""

import numpy as np
import pyarrow as pa
import pytest

from scribe_js_ray.pipelines import corpus


def _docs_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


BASE = ("the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest until the morning light appears slowly")


def test_ngram_jaccard_finds_near_dups(ray_session):
    texts = [
        BASE,
        BASE.replace("morning", "evening"),  # near-dup of 0
        "completely different content about ray data pipelines and arrow "
        "batches flowing through the streaming executor with backpressure",
        BASE,  # exact dup of 0
    ]
    pairs = corpus.ngram_jaccard_pairs(_docs_ds(texts), threshold=0.5) \
        .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 3) in got          # exact dup
    assert (0, 1) in got or (1, 3) in got  # near-dup collides
    assert all(2 not in p for p in got)    # distinct doc never pairs
    exact = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 3)]
    assert float(exact["jaccard"].iloc[0]) == 1.0


def test_emb_near_dup_exact_pairs(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8)
    vecs[5] = vecs[3] + 0.01 * rng.randn(8)  # planted near-dup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    pairs = corpus.emb_near_dup_pairs(ds, threshold=0.99).to_pandas()
    assert (3, 5) in set(zip(pairs["vec_a"], pairs["vec_b"]))
    # symmetric/self pairs are excluded
    assert (pairs["vec_a"] < pairs["vec_b"]).all()


def test_ivf_matches_brute_force_top1(ray_session):
    """IVF with enough probes must find the true nearest neighbor."""
    import ray.data as rd
    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 64)
    q = vecs[17] + 0.001 * rng.randn(64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    brute = corpus.knn_top_k(ds, list(q), k=5).to_pandas()
    ivf = corpus.knn_top_k_ivf(ds, list(q), k=5, n_cells=8,
                               n_probe=8).to_pandas()
    assert brute["vec_id"].iloc[0] == 17
    # full-probe IVF == brute force
    assert list(ivf["vec_id"]) == list(brute["vec_id"])


def test_ivf_partial_probe_recall(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(13)
    vecs = rng.randn(500, 64)
    q = vecs[42] + 0.001 * rng.randn(64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(500), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    ivf = corpus.knn_top_k_ivf(ds, list(q), k=10, n_cells=16,
                               n_probe=4).to_pandas()
    assert ivf["vec_id"].iloc[0] == 42  # planted NN lands in a probed cell


def test_bpe_token_counts():
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["Hello, world! 12345", ""], pa.string()),
    })
    out = corpus.add_bpe_token_counts(batch)
    # Hello , world ! 123 45  → 6
    assert out["n_bpe_tokens"].to_pylist() == [6, 0]


def test_rolling_fingerprint_properties():
    texts = [BASE, BASE, BASE + " extra tail", "short", ""]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = corpus.add_rolling_fingerprint(batch)
    fps = out["roll_fp"].to_pylist()
    assert fps[0] == fps[1]              # deterministic
    assert fps[0] == fps[2] or fps[2] is not None  # winnow min usually stable
    # repeated call gives identical values (no process-seed dependence)
    out2 = corpus.add_rolling_fingerprint(batch)
    assert fps == out2["roll_fp"].to_pylist()


def test_emb_lsh_buckets_deterministic(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    b1 = corpus.emb_lsh_buckets(ds).to_pandas().sort_values("vec_id")
    b2 = corpus.emb_lsh_buckets(ds).to_pandas().sort_values("vec_id")
    assert list(b1["bucket"]) == list(b2["bucket"])
    # near-identical vectors share a bucket
    vecs2 = np.vstack([vecs[0], vecs[0] + 1e-9])
    ds2 = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs2],
                              pa.list_(pa.float32())),
    }))
    b3 = corpus.emb_lsh_buckets(ds2).to_pandas()
    assert b3["bucket"].iloc[0] == b3["bucket"].iloc[1]


def test_emb_near_dup_lsh_finds_planted_pair(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(21)
    vecs = rng.randn(40, 64)
    vecs[9] = vecs[4] + 0.001 * rng.randn(64)  # planted near-dup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    pairs = corpus.emb_near_dup_lsh(ds, threshold=0.99).to_pandas()
    got = set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert (4, 9) in got
    assert all(a < b for a, b in got)
    # precision is exact: LSH output ⊆ exact all-pairs output
    exact = corpus.emb_near_dup_pairs(ds, threshold=0.99).to_pandas()
    assert got <= set(zip(exact["vec_a"], exact["vec_b"]))


def test_minhash_hot_bucket_star_cap(ray_session):
    # 30 identical docs collide in every band; with a cap below the
    # bucket size the emission degrades to O(n) star pairs anchored at
    # the bucket minimum — the connected component survives.
    texts = [BASE] * 30
    pairs = corpus.minhash_duplicate_pairs(_docs_ds(texts), bucket_cap=10) \
        .to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == {(0, j) for j in range(1, 30)}
    # without the cap the same corpus yields all n(n-1)/2 pairs
    full = corpus.minhash_duplicate_pairs(_docs_ds(texts), bucket_cap=1000) \
        .to_pandas()
    assert len(full) == 30 * 29 // 2


def test_ngram_jaccard_join_scale_path(ray_session):
    # Force the bucket-join branch (broadcast_cap=0) and check it agrees
    # with the broadcast fast path.
    texts = [BASE, BASE.replace("morning", "evening"), BASE,
             "totally different text about streams and executors here ok"]
    fast = corpus.ngram_jaccard_pairs(_docs_ds(texts), threshold=0.5) \
        .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True)
    joined = corpus.ngram_jaccard_pairs(_docs_ds(texts), threshold=0.5,
                                        broadcast_cap=0) \
        .to_pandas().sort_values(["doc_a", "doc_b"], ignore_index=True)
    assert list(fast["doc_a"]) == list(joined["doc_a"])
    assert list(fast["doc_b"]) == list(joined["doc_b"])
    assert list(fast["jaccard"]) == list(joined["jaccard"])


def test_emb_lsh_hot_bucket_star_cap(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(33)
    base = rng.randn(64)
    vecs = base + 1e-4 * rng.randn(24, 64)  # all near-identical
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(24), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    pairs = corpus.emb_near_dup_lsh(ds, threshold=0.99,
                                    bucket_cap=8).to_pandas()
    got = set(zip(pairs["vec_a"], pairs["vec_b"]))
    # star pattern anchored at the minimum id covers every member
    assert got == {(0, j) for j in range(1, 24)}


def test_connected_components_chain_and_island(ray_session):
    import ray.data as rd
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 7, 10], pa.int64()),
        "doc_b": pa.array([2, 3, 8, 11], pa.int64()),
    }))
    out = corpus.connected_components(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10}


def test_dup_clusters_end_to_end(ray_session):
    texts = [BASE, BASE, BASE.replace("morning", "evening"),
             "an unrelated document about arrow record batches and rays",
             BASE]
    out = corpus.dup_clusters(_docs_ds(texts)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster"]))
    # all BASE-derived docs collapse to cluster 0; the unrelated doc is
    # not in any pair (absent from the output)
    assert got.get(0) == 0 and got.get(1) == 0 and got.get(4) == 0
    assert 3 not in got


def test_connected_components_paths_agree(ray_session):
    import ray.data as rd
    pairs = pa.table({
        "doc_a": pa.array([5, 1, 2, 9, 20], pa.int64()),
        "doc_b": pa.array([6, 2, 3, 1, 21], pa.int64()),
    })
    fast = corpus.connected_components(rd.from_arrow(pairs)).to_pandas()
    dist = corpus.connected_components(rd.from_arrow(pairs),
                                       broadcast_cap=0).to_pandas()
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["cluster"]) == list(dist["cluster"])


def test_dedup_keep_list_broadcast_path(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dedup_keep_list

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64())}))
    # components {1,3,5} and {7,8}; 0,2,4,6,9 unclustered
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 3, 7], pa.int64()),
        "doc_b": pa.array([3, 5, 8], pa.int64()),
    }))
    kept = sorted(dedup_keep_list(docs, pairs).to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 4, 6, 7, 9]  # min per cluster + singles


def test_dedup_keep_list_anti_join_path(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dedup_keep_list

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 2], pa.int64()),
        "doc_b": pa.array([4, 3], pa.int64()),
    }))
    kept = sorted(dedup_keep_list(docs, pairs,
                                  drop_broadcast_cap=0)
                  .to_pandas()["doc_id"])
    assert kept == [0, 1, 2, 5]


def test_dedup_keep_list_no_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dedup_keep_list

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 6], pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
    }))
    kept = sorted(dedup_keep_list(docs, pairs).to_pandas()["doc_id"])
    assert kept == [5, 6]


def test_ivf_trained_centroids_persisted_and_better(ray_session):
    """k-means training persists centroids with the index; probes load
    them, and trained cells reflect actual data clusters (a planted
    tight cluster maps to one cell)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    import tempfile, os

    from scribe_js_ray.pipelines import corpus

    rng = np.random.RandomState(3)
    # two tight clusters + noise
    c1 = rng.randn(64); c1 /= np.linalg.norm(c1)
    c2 = rng.randn(64); c2 /= np.linalg.norm(c2)
    vecs = [c1 + rng.randn(64) * 0.05 for _ in range(40)] + \
           [c2 + rng.randn(64) * 0.05 for _ in range(40)] + \
           [rng.randn(64) for _ in range(40)]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    }))
    idx = tempfile.mkdtemp(prefix="ivf-train-test-")
    corpus.build_ivf_index(ds, idx, n_cells=8)
    assert os.path.isfile(os.path.join(idx, "_centroids.parquet"))
    cents = corpus.load_ivf_centroids(idx, 8, 64)
    # after training, SOME centroid aligns tightly with each cluster
    assert (cents @ (c1 / np.linalg.norm(c1))).max() > 0.9
    assert (cents @ (c2 / np.linalg.norm(c2))).max() > 0.9
    # probes still return the planted NN through the trained index
    out = corpus.knn_top_k_ivf(ds, list(vecs[0]), k=3, n_cells=8,
                               n_probe=2, index_dir=idx).to_pandas()
    assert out["vec_id"].iloc[0] == 0


def test_decontaminate_overlap_counts(ray_session):
    import ray.data as rd

    from scribe_js_ray.functions.joins import BroadcastTable
    from scribe_js_ray.pipelines.corpus import (benchmark_ngram_table,
                                                decontaminate)

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e",              # benchmark doc (0 % 50 == 0): grams abc bcd cde
            "a b c x y",              # shares exactly "a b c"
            "p q r s",                # no overlap
            "a b",                    # too short for a 3-gram
        ]),
    })
    ds = rd.from_arrow(docs)
    bench = benchmark_ngram_table(ds)
    assert set(bench["g"].to_pylist()) == {"a b c", "b c d", "c d e"}
    out = decontaminate(ds, BroadcastTable(bench)).sort("doc_id") \
        .to_pandas()
    assert out["n_grams"].tolist() == [3, 3, 2, 0]
    assert out["n_contaminated"].tolist() == [3, 1, 0, 0]


def test_decontaminate_distinct_gram_semantics(ray_session):
    import ray.data as rd

    from scribe_js_ray.functions.joins import BroadcastTable
    from scribe_js_ray.pipelines.corpus import (benchmark_ngram_table,
                                                decontaminate)

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "x y z x y z x y z",      # repeated grams count once (distinct)
            "   ",                     # whitespace-only → zero grams
        ]),
    })
    ds = rd.from_arrow(docs)
    out = decontaminate(ds, BroadcastTable(benchmark_ngram_table(ds))) \
        .sort("doc_id").to_pandas()
    # 9 tokens → 7 positional 3-grams but only 3 distinct ones
    assert out["n_grams"].tolist() == [3, 0]
    assert out["n_contaminated"].tolist() == [3, 0]


def test_stratified_sample_deterministic_gate(ray_session):
    """The md5 gate is deterministic (same subset on re-run) and
    rate-plausible per stratum (en ~1/8, tail ~1/2)."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import stratified_sample

    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "lang"]).materialize()
    a = stratified_sample(docs).to_pandas().sort_values("doc_id")
    b = stratified_sample(docs).to_pandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()
    full = docs.to_pandas()
    en_rate = (a.lang == "en").sum() / (full.lang == "en").sum()
    rest_rate = (a.lang != "en").sum() / (full.lang != "en").sum()
    assert 0.04 < en_rate < 0.25       # target 1/8
    assert 0.35 < rest_rate < 0.65     # target 1/2


def test_key_terms_rank_tiebreaks(ray_session):
    """tf desc, then df asc (rarer term wins), then term asc."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import doc_key_terms

    docs = rd.from_items([
        {"doc_id": 1, "text": "apple apple zebra banana banana"},
        {"doc_id": 2, "text": "banana cherry"},
    ])
    out = doc_key_terms(docs, k=3).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    d1 = out[out.doc_id == 1]
    # tf=2 for apple and banana; banana has df=2 (both docs) so APPLE
    # (df=1) outranks it; zebra tf=1 comes last
    assert d1.term.tolist() == ["apple", "banana", "zebra"]
    assert d1.tf.tolist() == [2, 2, 1]
    assert d1.df.tolist() == [1, 2, 1]


def test_pack_sequences_invariants(ray_session):
    """Next-fit packing: per-sequence token mass <= budget (unless a
    single doc exceeds it), offsets contiguous, every doc placed once,
    and the packing is block-boundary independent (deterministic)."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import pack_sequences

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = pack_sequences(docs, budget_tokens=512, n_shards=8) \
        .to_pandas().sort_values(["shard", "seq_id", "doc_id"])
    full = docs.to_pandas()
    assert sorted(out.doc_id) == sorted(full.doc_id)      # each doc once
    assert (out.doc_id % 8 == out.shard).all()            # shard rule
    for (_, _), g in out.groupby(["shard", "seq_id"]):
        sizes = g.n_tokens.to_numpy()
        offs = g.token_offset.to_numpy()
        assert offs[0] == 0
        expect = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        assert (offs == expect).all()
        assert sizes.sum() <= 512 or len(g) == 1          # oversize solo
    # determinism under different block structure
    out2 = pack_sequences(docs.repartition(7), budget_tokens=512,
                          n_shards=8).to_pandas() \
        .sort_values(["shard", "seq_id", "doc_id"]).reset_index(drop=True)
    assert out.reset_index(drop=True).equals(out2)


def test_domain_stats_distinct_and_quality(ray_session):
    """Distinct-text count collapses exact dups; quality mass counts
    every copy of a passing text."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import domain_stats

    good = "word " * 80
    docs = rd.from_items([
        {"doc_id": 0, "source": "a", "text": good},
        {"doc_id": 1, "source": "a", "text": good},        # exact dup
        {"doc_id": 2, "source": "a", "text": "short junk"},
        {"doc_id": 3, "source": "b", "text": "x y z"},
    ])
    out = domain_stats(docs).to_pandas().set_index("source")
    assert out.loc["a"].n_docs == 3
    assert out.loc["a"].n_distinct_texts == 2
    assert out.loc["a"].n_quality == 2      # both copies of the good text
    assert out.loc["b"].n_quality == 0


def test_dup_span_profile_counts(ray_session):
    """Shared 8-gram counted once per doc occurrence; an in-doc repeat
    raises n_occurrences but not n_docs; short docs emit nothing;
    unique grams are filtered."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dup_span_profile

    shared = "a b c d e f g h"
    docs = rd.from_items([
        {"doc_id": 0, "text": shared + " tail0"},
        {"doc_id": 1, "text": "head1 " + shared},
        # doc 2 contains the shared gram TWICE (overlapping windows
        # around the repeat also create unique grams — filtered out)
        {"doc_id": 2, "text": shared + " " + shared},
        {"doc_id": 3, "text": "too short"},
    ])
    out = dup_span_profile(docs, n=8).to_pandas()
    row = out[out.gram == shared]
    assert len(row) == 1
    assert int(row.n_occurrences.iloc[0]) == 4  # docs 0,1 + twice in 2
    assert int(row.n_docs.iloc[0]) == 3
    # every emitted gram is genuinely duplicated
    assert (out.n_occurrences > 1).all()
    # profile is sorted by n_occurrences desc then gram asc
    assert out.n_occurrences.is_monotonic_decreasing or len(out) <= 1


def test_dedup_spans_apply_semantics(ray_session):
    """Canonical (globally first) occurrence keeps its tokens; every
    other occurrence — cross-doc AND in-doc repeats — is removed; a
    token covered by any killed span drops; short docs pass through."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dedup_spans_apply

    shared = "a b c d e f g h"
    docs = rd.from_items([
        {"doc_id": 0, "text": shared + " tail0 x y z"},
        {"doc_id": 1, "text": "head1 " + shared},
        {"doc_id": 2, "text": shared + " " + shared},
        {"doc_id": 3, "text": "too short"},
    ])
    out = dedup_spans_apply(docs, n=8).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc 0 holds the canonical occurrence — untouched
    assert out.loc[0, "text_dedup"] == shared + " tail0 x y z"
    assert out.loc[0, "n_removed"] == 0
    # doc 1: the shared 8 tokens vanish, the unique head survives
    assert out.loc[1, "text_dedup"] == "head1"
    assert out.loc[1, "n_removed"] == 8
    # doc 2: both in-doc occurrences are non-canonical; the bridging
    # grams around the midpoint are unique (count 1) so only the two
    # aligned occurrences kill — but their spans cover ALL 16 tokens
    assert out.loc[2, "text_dedup"] == ""
    assert out.loc[2, "n_removed"] == 16
    # doc 3: fewer than n tokens — unchanged
    assert out.loc[3, "text_dedup"] == "too short"
    assert out.loc[3, "n_removed"] == 0


def test_dedup_spans_apply_scale_path_agrees(ray_session):
    """broadcast_cap=0 forces the map_groups + hash-bucket-join scale
    path; output must equal the broadcast path row for row."""
    import ray.data as rd

    from scribe_js_ray.pipelines.corpus import dedup_spans_apply

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(24)]
    # plant duplicates: doc 20 repeats doc 0's middle, doc 21 = doc 1
    texts[20] = texts[20][:50].rsplit(" ", 1)[0] + " " + \
        " ".join(texts[0].split(" ")[10:22])
    texts[21] = texts[1]
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])

    fast = dedup_spans_apply(docs, n=8).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    slow = dedup_spans_apply(docs, n=8, broadcast_cap=0).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert fast.equals(slow)
    assert (fast.loc[fast.doc_id == 21, "n_removed"] > 0).all()
