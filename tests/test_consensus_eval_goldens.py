"""Golden-value twins for the two no-oracle driver queries
``ocr_consensus`` and ``eval_word_accuracy`` (VERDICT r4 #7): the
expected values are derived INDEPENDENTLY from documents.text and the
pipelines' published semantics, so these are byte-exact local oracles,
not run-once snapshots.

ocr_consensus: the base layer corrupts word[0] → 'z'*len(word[0]) (SAME
length, so the synthetic typesetter flows the corrupted layer with
identical geometry and the spatial vote aligns exactly) with two clean
comparators — a correct consensus vote must restore the clean text
byte-exactly, fire the majority replacement exactly once per doc, and
rank every other word 'high' (both comparators corroborate).

eval_word_accuracy: each doc replaces exactly one word with 'corrupted'
(a token outside the corpus vocabulary), so LCS alignment must yield
correct == total − n_docs, incorrect == n_docs, missed == extra == 0.
"""

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_ocr_consensus_restores_clean_text(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from scribe_js_ray.pipelines.consensus import consensus_over_layers
    from scribe_js_ray.sources.synth import hocr_from_text

    docs = _docs()[:64]
    urls, layers, payloads = [], [], []
    for doc_id, text in docs:
        url = f"https://fix.test/doc/{doc_id:06d}"
        words = (text or "").split()
        typo = "z" * len(words[0])
        assert words and words[0] != typo  # corruption is a real change
        base = hocr_from_text(" ".join([typo] + words[1:]), doc_id)
        clean = hocr_from_text(text, doc_id)
        for layer, payload in ((0, base), (1, clean), (2, clean)):
            urls.append(url)
            layers.append(layer)
            payloads.append(payload)
    layers_ds = rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "layer": pa.array(layers, pa.int32()),
        "html": pa.array(payloads, pa.binary()),
    }))
    out = consensus_over_layers(layers_ds).to_pandas() \
        .set_index("url").sort_index()
    assert len(out) == len(docs)
    for doc_id, text in docs:
        row = out.loc[f"https://fix.test/doc/{doc_id:06d}"]
        # the vote must restore the clean layer's text byte-exactly
        assert row["consensus_text"] == " ".join(text.split()), doc_id
        # exactly the one injected corruption was majority-replaced
        assert row["n_replaced"] == 1, doc_id
        # every other word got corroboration from BOTH comparators
        # (identical text at identical coordinates → exact count)
        assert row["n_high"] == len(text.split()) - 1, doc_id


def test_eval_word_accuracy_exact_counters(ray_session):
    import pandas as pd

    import __ray_entry__ as e

    docs = _docs()
    n_docs = len(docs)
    total = sum(len(t.split()) for _, t in docs)
    assert all(t.split() for _, t in docs)  # no empty docs in testdata
    assert not any("corrupted" in t.split() for _, t in docs)

    out = e._eval_word_accuracy(SF_DIR)
    assert isinstance(out, pd.DataFrame) and len(out) == 1
    row = out.iloc[0]
    assert row["total"] == total
    assert row["correct"] == total - n_docs
    assert row["incorrect"] == n_docs
    assert row["missed"] == 0
    assert row["extra"] == 0
    assert row["word_accuracy"] == (total - n_docs) / total
