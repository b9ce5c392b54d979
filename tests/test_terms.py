"""Term/vocabulary operators vs DuckDB: word count (partial-aggregation
combiner), top-k terms, per-doc tf, and TF-IDF distinctive-term selection."""

import duckdb
import numpy as np
import pyarrow as pa

from timezonemap_ray.stages.terms import (
    distinctive_terms, doc_term_freq, term_counts, top_terms)


def _docs_tbl():
    rng = np.random.default_rng(11)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast",
             "zebra", "Big", "big,", "a"]
    texts, ids = [], []
    for i in range(300):
        n = int(rng.integers(0, 30))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        # irregular whitespace exercises the \S+ contract
        sep = ["  ", " ", "\t", " \n "][int(rng.integers(0, 4))]
        texts.append(sep.join(words) + (" " if i % 3 == 0 else ""))
        ids.append(i)
    texts[0] = ""          # empty doc → no tokens
    texts[1] = "   \t  "   # whitespace-only doc → no tokens
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts)})


def _ds(tbl, blocks=7):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(blocks)


def _con(tbl):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con


def test_term_counts_matches_duckdb(ray_session):
    tbl = _docs_tbl()
    got = term_counts(_ds(tbl)).to_pandas().sort_values("term") \
        .reset_index(drop=True)
    want = _con(tbl).execute(r"""
        SELECT term, count(*)::BIGINT AS n
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS term
              FROM documents)
        GROUP BY term ORDER BY term""").df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_top_terms_deterministic_ties(ray_session):
    tbl = _docs_tbl()
    got = top_terms(_ds(tbl), k=5)
    want = _con(tbl).execute(r"""
        SELECT term, count(*)::BIGINT AS n
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS term
              FROM documents)
        GROUP BY term ORDER BY n DESC, term ASC LIMIT 5""").df()
    assert got["term"].to_pylist() == want["term"].tolist()
    assert got["n"].to_pylist() == want["n"].tolist()


def test_doc_term_freq_matches_duckdb(ray_session):
    tbl = _docs_tbl()
    got = doc_term_freq(_ds(tbl)).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = _con(tbl).execute(r"""
        SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
              FROM documents)
        GROUP BY doc_id, term ORDER BY doc_id, term""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()


def test_distinctive_terms_matches_duckdb(ray_session):
    tbl = _docs_tbl()
    got = distinctive_terms(_ds(tbl), n_parts=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _con(tbl).execute(r"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
               FROM toks GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                     ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
          FROM tf JOIN df USING (term))
        SELECT doc_id, term, tf, df FROM scored WHERE rn = 1
        ORDER BY doc_id""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    # the float tfidf column is monotone in the integer proxy per doc:
    # spot-check tf·ln(N/df) on a few rows
    n_docs = tbl.num_rows
    for _, r in got.head(20).iterrows():
        assert np.isclose(r["tfidf"], r["tf"] * np.log(n_docs / r["df"]))


def test_tf_idf_empty_dataset(ray_session):
    tbl = pa.table({"doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string())})
    assert term_counts(_ds(tbl, blocks=2)).count() == 0
    assert top_terms(_ds(tbl, blocks=2), k=3).num_rows == 0


def test_inverted_index_matches_duckdb(ray_session):
    from timezonemap_ray.stages.terms import inverted_index
    tbl = _docs_tbl()
    got = inverted_index(_ds(tbl)).to_pandas().sort_values("term") \
        .reset_index(drop=True)
    want = _con(tbl).execute(r"""
        WITH pairs AS (
            SELECT DISTINCT term, doc_id FROM (
                SELECT unnest(regexp_extract_all(text, '\S+')) AS term,
                       doc_id FROM documents))
        SELECT term, count(*)::BIGINT AS n_docs,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        FROM pairs GROUP BY term ORDER BY term""").df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["postings"].tolist() == want["postings"].tolist()


def test_inverted_index_posting_order_and_empty_docs(ray_session):
    from timezonemap_ray.stages.terms import inverted_index
    tbl = pa.table({
        "doc_id": pa.array([9, 3, 7, 5], type=pa.int64()),
        "text": pa.array(["cat dog cat", "dog", "", "cat"]),
    })
    got = inverted_index(_ds(tbl, blocks=3)).to_pandas() \
        .set_index("term").sort_index()
    assert got.loc["cat", "postings"] == "5,9"   # ascending despite input order
    assert got.loc["cat", "n_docs"] == 2         # dup token in one doc counted once
    assert got.loc["dog", "postings"] == "3,9"
    assert 7 not in got["postings"].str.split(",").explode().astype(int).tolist()


def test_bigram_counts_matches_duckdb(ray_session):
    from timezonemap_ray.stages.terms import bigram_counts
    tbl = _docs_tbl()
    got = bigram_counts(_ds(tbl)).to_pandas().sort_values("bigram") \
        .reset_index(drop=True)
    want = _con(tbl).execute(r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                      FROM documents)
        SELECT bigram, count(*)::BIGINT AS n FROM (
            SELECT unnest(list_transform(range(1, len(l)),
                          i -> l[i] || ' ' || l[i+1])) AS bigram
            FROM toks WHERE len(l) >= 2)
        GROUP BY bigram ORDER BY bigram""").df()
    assert got["bigram"].tolist() == want["bigram"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    # single-token and empty docs contribute nothing
    import ray.data as rd
    one = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["solo", ""])})
    assert bigram_counts(rd.from_arrow(one)).count() == 0


def test_lm_score_docs_matches_duckdb_and_partitioning(ray_session):
    """lm_score_docs ≡ the SQL twin on chaos docs (empty/whitespace-only
    docs score 0), identical across partitionings, and the min_count
    pruning knob zeroes rare bigrams."""
    from timezonemap_ray.oracle import lm_score_docs_sql
    from timezonemap_ray.stages.terms import lm_score_docs

    tbl = _docs_tbl()
    con = _con(tbl)
    want = con.sql(lm_score_docs_sql() + " ORDER BY 1").df()

    got3 = lm_score_docs(_ds(tbl, 3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got11 = lm_score_docs(_ds(tbl, 11)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got3, want)
    pd.testing.assert_frame_equal(got3, got11)
    assert got3.loc[0, "lm_score"] == 0 and got3.loc[0, "n_bigrams"] == 0

    # pruning: min_count above every bigram's corpus count zeroes scores
    # but keeps n_bigrams
    pruned = lm_score_docs(_ds(tbl, 5), min_count=10**9).to_pandas()
    assert (pruned["lm_score"] == 0).all()
    assert pruned["n_bigrams"].sum() == got3["n_bigrams"].sum()

    # overflow guard trips loudly instead of wrapping
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overflows int64"):
        lm_score_docs(_ds(tbl, 3), q=2**62)
