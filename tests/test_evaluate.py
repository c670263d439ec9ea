"""Text-level eval metrics: per-pair counters + corpus reduce."""

import pyarrow as pa

from scribe_js_ray.pipelines.evaluate import (
    eval_layers_batch, eval_text_pair, reduce_eval_metrics)


def test_identical_text():
    st = eval_text_pair("a b c", "a b c")
    assert st == {"total": 3, "correct": 3, "incorrect": 0, "missed": 0,
                  "extra": 0}


def test_substitution():
    st = eval_text_pair("a X c", "a b c")
    assert st["correct"] == 2
    assert st["incorrect"] == 1
    assert st["total"] == 3


def test_missing_and_extra():
    st = eval_text_pair("a b", "a b c")     # candidate missed 'c'
    assert st["missed"] == 1 and st["extra"] == 0
    st2 = eval_text_pair("a b c d", "a b c")  # candidate added 'd'
    assert st2["extra"] == 1 and st2["missed"] == 0


def test_empty_sides():
    assert eval_text_pair("", "")["total"] == 0
    st = eval_text_pair("", "x y")
    assert st["missed"] == 2 and st["correct"] == 0


def test_corpus_reduce(ray_session):
    import ray.data as rd
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text_a": ["perfect match here", "one wrng word"],
        "text_b": ["perfect match here", "one wrong word"],
    })
    ds = rd.from_arrow(tbl).map_batches(eval_layers_batch,
                                        batch_format="pyarrow")
    agg = reduce_eval_metrics(ds)
    assert agg["total"] == 6
    assert agg["correct"] == 5
    assert agg["incorrect"] == 1
    assert abs(agg["word_accuracy"] - 5 / 6) < 1e-9
