"""Corpus-management stage tests: hash splits, per-group quotas, and
train/test decontamination (timezonemap_ray/stages/corpus.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from timezonemap_ray.stages.corpus import (
    Decontaminator, collect_benchmark_shingles, decontaminate,
    quota_per_group, quota_sql_order, split_assign, split_counts,
    split_sql_expr)


def _docs_table(n=300, seed=7):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]
    texts = [" ".join(f"w{rng.integers(0, 50)}" for _ in range(12))
             for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lang": pa.array(langs),
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })


def test_split_counts_matches_duckdb(ray_session):
    tbl = _docs_table()
    got = split_counts(rd.from_arrow(tbl).repartition(5),
                       "doc_id", "lang", sum_col="n_chars").to_pandas() \
        .sort_values(["split", "lang"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        f"SELECT {split_sql_expr('doc_id')} AS split, lang, "
        f"count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_n_chars "
        f"FROM documents GROUP BY 1, 2 ORDER BY split, lang").df()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert got["sum_n_chars"].tolist() == want["sum_n_chars"].tolist()
    assert got["split"].tolist() == want["split"].tolist()
    # splits are a disjoint cover: totals add up
    assert got["n_rows"].sum() == tbl.num_rows


def test_split_assign_consistent_with_counts(ray_session):
    tbl = _docs_table(n=100)
    ds = split_assign(rd.from_arrow(tbl).repartition(3), "doc_id")
    df = ds.to_pandas()
    assert set(df["split"]) <= {"train", "val", "test"}
    # same doc always gets the same split (determinism across runs)
    df2 = split_assign(rd.from_arrow(tbl), "doc_id").to_pandas()
    m1 = dict(zip(df["doc_id"], df["split"]))
    m2 = dict(zip(df2["doc_id"], df2["split"]))
    assert m1 == m2


def test_quota_per_group_matches_duckdb(ray_session):
    tbl = _docs_table(n=200)
    # skew: put half the docs in one group
    src = np.where(np.arange(200) < 100, "big",
                   np.array(["s1", "s2", "s3", "s4"])[np.arange(200) % 4])
    tbl = tbl.set_column(1, "source", pa.array(src.astype(object)))
    got = quota_per_group(rd.from_arrow(tbl).repartition(7),
                          "source", "doc_id", 5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(
        f"""WITH ranked AS (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY source ORDER BY {quota_sql_order('doc_id')})
              AS rn FROM documents)
            SELECT doc_id FROM ranked WHERE rn <= 5
            ORDER BY doc_id""").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got.groupby("source").size().max() <= 5
    # groups smaller than k survive whole
    assert (got["source"] == "s1").sum() == min(5, (src == "s1").sum())


def test_decontaminate_plants_and_clears(ray_session):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    clean = "one two three four five six seven eight nine ten"
    # doc 2 embeds an 8-gram of the benchmark text mid-document
    dirty = "x y " + " ".join(bench_text.split()[:8]) + " z"
    short = "too short"     # < shingle tokens: never contaminated
    corpus = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                       "text": pa.array([clean, dirty, short])})
    bench = pa.table({"doc_id": pa.array([99], type=pa.int64()),
                      "text": pa.array([bench_text])})
    out = decontaminate(rd.from_arrow(corpus), rd.from_arrow(bench),
                        shingle=8, concurrency=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [False, True, False]
    assert out["n_hits"].tolist() == [0, 1, 0]


def test_decontaminate_empty_benchmark(ray_session):
    corpus = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                       "text": pa.array(["a b c d e f g h i"])})
    bench = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    out = decontaminate(rd.from_arrow(corpus), rd.from_arrow(bench),
                        shingle=8, concurrency=1).to_pandas()
    assert out["contaminated"].tolist() == [False]


def test_decontaminator_exact_string_verify(ray_session):
    """The hash screen's hits are re-verified against exact strings:
    a fabricated hash collision cannot flip a verdict. We simulate by
    handing the Decontaminator a hash set that CONTAINS the doc's
    shingle hashes but a string set that does NOT — n_hits must be 0."""
    import ray
    text = "p q r s t u v w x"
    hs, _ = collect_benchmark_shingles(
        rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                                "text": pa.array([text])})), shingle=8)
    d = Decontaminator(ray.put(hs), ray.put(frozenset()), shingle=8)
    out = d(pa.table({"doc_id": pa.array([5], type=pa.int64()),
                      "text": pa.array([text])}))
    assert out["n_hits"].to_pylist() == [0]
    assert out["contaminated"].to_pylist() == [False]


def test_decontaminate_tiny_cluster_task_pool(ray_session, monkeypatch):
    """cpus <= 2 routes through the stateless task pool (no actor pool to
    starve the read) — same results as the actor-pool path."""
    import ray.data as rd
    from timezonemap_ray.stages import corpus as C
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota",
                 "totally unrelated words here nothing shared at all ok",
                 "x y z " * 10]})
    bench = pa.table({
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota"]})
    want = C.decontaminate(rd.from_arrow(docs), rd.from_arrow(bench),
                           shingle=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import ray as ray_mod
    monkeypatch.setattr(ray_mod, "cluster_resources", lambda: {"CPU": 1})
    got = C.decontaminate(rd.from_arrow(docs), rd.from_arrow(bench),
                          shingle=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)
    assert got["contaminated"].tolist() == [True, False, False]
