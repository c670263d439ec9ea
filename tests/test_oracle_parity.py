"""Mirror of the driver's correctness gate: run each queries() entry and its
oracle_sql() twin on sf0.001 and compare row count + (sorted-column) values.
"""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa
        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _assert_frames_match(ours: pd.DataFrame, oracle: pd.DataFrame, name):
    assert len(ours) == len(oracle), \
        f"{name}: rows {len(ours)} != {len(oracle)}"
    assert sorted(ours.columns) == sorted(oracle.columns), \
        f"{name}: columns {sorted(ours.columns)} != {sorted(oracle.columns)}"
    a, b = _norm(ours), _norm(oracle)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (x == y) or (math.isnan(x) and math.isnan(y)) or \
                    math.isclose(float(x), float(y), rel_tol=1e-9,
                                 abs_tol=1e-9)
            else:
                ok = str(x) == str(y)
            assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def _pairs():
    import __ray_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in o]


@pytest.mark.parametrize("name,query,sql",
                         _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(ray_session, name, query, sql):
    ours = _to_pandas(query(SF_DIR))
    oracle = _oracle(sql)
    _assert_frames_match(ours, oracle, name)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e
    q = e.queries()
    rows_only = set(q) - set(e.oracle_sql())
    assert rows_only  # at least the extraction + sketch ops
    for name in sorted(rows_only):
        df = _to_pandas(q[name](SF_DIR))
        assert df is not None
        assert len(df) >= 0


def test_curate_oracle_preconditions(ray_session):
    """The corpus_curate_e2e oracle is valid ONLY because (a) extraction
    of the synthetic hOCR pages round-trips to exactly
    ``' '.join(text.split())`` per document, and (b) pdf_image_dedup's
    doc ids (first 48 of documents.parquet) are 0..47 — pin both."""
    import __ray_entry__ as e
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    assert docs["doc_id"].to_pylist()[:48] == list(range(48))

    by_url = {f"https://docs.test/{d:08d}": t
              for d, t in zip(docs["doc_id"].to_pylist(),
                              docs["text"].to_pylist())}
    out = _to_pandas(e._extract_corpus(SF_DIR))
    assert len(out) == docs.num_rows
    for url, et in zip(out["url"], out["extracted_text"]):
        assert et == " ".join(by_url[url].split()), url


def test_oracle_queries_ordered_first():
    """Every oracle-backed query must PRECEDE every rows-only one in
    queries(): the driver's correctness check may truncate the dict (r4
    stopped at 50/60 and silently dropped green oracle rows), and dict
    order is the only knob we control."""
    import __ray_entry__ as e
    names = list(e.queries())
    oracle = set(e.oracle_sql())
    assert oracle <= set(names)
    first_rows_only = next(i for i, n in enumerate(names)
                           if n not in oracle)
    late_oracle = [n for n in names[first_rows_only:] if n in oracle]
    assert not late_oracle, \
        f"oracle-backed queries listed after rows-only ones: {late_oracle}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    ds = e.entry()
    df = _to_pandas(ds.limit(20))
    assert len(df) == 20
    assert "extracted_text" in df.columns
    assert (df["extracted_text"].str.len() > 0).all()


def test_oracle_backed_queries_precede_rows_only():
    """ORDER CONTRACT (VERDICT r4 #3): a driver correctness check that
    truncates the queries() dict must never drop an oracle-backed query
    in favor of a rows-only one."""
    import __ray_entry__ as e
    order = list(e.queries())
    oracled = set(e.oracle_sql())
    assert oracled <= set(order)
    seen_rows_only = False
    for name in order:
        if name in oracled:
            assert not seen_rows_only, \
                f"oracle-backed {name!r} follows a rows-only query"
        else:
            seen_rows_only = True
