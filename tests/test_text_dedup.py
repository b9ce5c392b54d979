"""Text-analysis + dedup operators: DuckDB equivalence for the SQL-checkable
ones, synthetic-duplicate recall for the LSH family."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timezonemap_ray.stages import dedup, text


@pytest.fixture(scope="module")
def docs_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


@pytest.fixture(scope="module")
def con(docs_path):
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_path}')")
    return c


def _ray_df(tbl) -> pd.DataFrame:
    if hasattr(tbl, "to_pandas"):
        return tbl.to_pandas()
    return tbl


def test_token_count_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    out = rd.read_parquet(docs_path, columns=["doc_id", "text"]) \
            .map_batches(text.token_count, batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
    sql = con.sql("""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE array_length(string_split_regex(trim(text), '\\s+'))
               END::BIGINT AS n_tokens,
               length(text)::BIGINT AS n_chars
        FROM documents ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(out, sql)


def test_quality_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    out = rd.read_parquet(docs_path, columns=["doc_id", "text"]) \
            .map_batches(text.quality_score, batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
    sql = con.sql(r"""
        SELECT doc_id,
               length(text)::BIGINT AS n_chars,
               len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
               len(regexp_extract_all(text, '[.,;:!?]'))::BIGINT AS punct_count,
               len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b'))::BIGINT
                   AS stop_count,
               CAST(len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b'))
                    AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '\S+')), 1)
               + CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                 / greatest(length(text), 1) AS quality
        FROM documents ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(out, sql)


def test_exact_dedup_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    out = dedup.exact_dedup(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    sql = con.sql("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_dupes
        FROM documents GROUP BY md5(text) ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(
        out, sql.astype({"doc_id": out["doc_id"].dtype,
                         "n_dupes": out["n_dupes"].dtype}))


def _dup_corpus():
    """Synthetic corpus with known exact/near/far duplicate structure."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight looking for food")
    near = base.replace("dark", "cold")            # 1-word change
    far = "completely different text about databases and query engines here"
    rows = []
    for i, t in enumerate([base, base, near, far,
                           "another unrelated document entirely about ray data",
                           base + " extra tail words appended here"]):
        rows.append({"doc_id": i, "text": t})
    return pa.Table.from_pylist(rows)


def test_minhash_finds_near_dups(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_dup_corpus())
    out = dedup.minhash_dedup(ds, threshold=0.5).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1] == 0          # exact dups cluster
    assert cl[2] == 0                    # near dup joins the cluster
    assert cl[3] == 3 and cl[4] == 4     # unrelated docs stay alone
    assert bool(out.loc[out["doc_id"] == 1, "is_duplicate"].iloc[0])


def test_ngram_jaccard_verifies(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_dup_corpus())
    out = dedup.ngram_jaccard_dedup(ds, threshold=0.5).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1] == 0
    assert cl[3] == 3 and cl[4] == 4


def test_simhash_near_dups(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_dup_corpus())
    out = dedup.simhash_dedup(ds, max_hamming=3).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1] == 0           # identical simhash
    assert cl[3] != cl[0] and cl[4] != cl[0]


def test_simhash64_properties():
    a = dedup.simhash64("the quick brown fox jumps over the lazy dog")
    b = dedup.simhash64("the quick brown fox jumps over the lazy dog")
    c = dedup.simhash64("totally different words in this one text")
    assert a == b
    ham = bin(a ^ c).count("1")
    assert ham > 3
    assert dedup.simhash64("") == 0


def test_embedding_dedup(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(9)
    base = rng.standard_normal((20, 16))
    vecs = np.vstack([base, base[0] + 1e-4 * rng.standard_normal(16)])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(21), type=pa.int64()),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
    })
    out = dedup.embedding_dedup(rd.from_arrow(tbl), dim=16,
                                threshold=0.999).to_pandas()
    cl = dict(zip(out["vec_id"], out["cluster_id"]))
    assert cl[20] == cl[0] == 0          # perturbed copy clusters with base
    assert sum(out["is_duplicate"]) == 1


def test_lang_id_deterministic(ray_session, docs_path):
    import ray.data as rd
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    a = ds.map_batches(text.lang_id, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = ds.map_batches(text.lang_id, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["lang_pred"]) <= set(text.LANG_MARKERS)


def test_rolling_fingerprint_deterministic():
    t = pa.table({"doc_id": [1, 2], "text": ["hello world", "hello world!"]})
    a = text.rolling_fingerprint(t)
    b = text.rolling_fingerprint(t)
    assert a["fingerprint"].to_pylist() == b["fingerprint"].to_pylist()
    assert a["fingerprint"][0].as_py() != a["fingerprint"][1].as_py()


def test_distributed_cc_matches_union_find(ray_session):
    """Label-propagation connected components (the beyond-driver-RAM path)
    ≡ driver union-find, on chains + random merges + singletons."""
    import ray.data as rd
    rng = np.random.default_rng(31)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    pairs = set()
    for s in range(0, 100, 10):            # ten 10-node chains
        for k in range(s, s + 9):
            pairs.add((k, k + 1))
    for _ in range(60):                     # random merges in 100..199
        a, b = sorted(rng.integers(100, 200, size=2))
        if a != b:
            pairs.add((int(a), int(b)))
    # 200..299 stay singletons
    ids_ds = rd.from_arrow(pa.table({"doc_id": ids}))
    plist = sorted(pairs)
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in plist], type=pa.int64()),
        "b": pa.array([p[1] for p in plist], type=pa.int64())}))
    out = dedup.clusters_from_pairs_ds(ids_ds, pairs_ds).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))
    want = dedup.clusters_from_pairs(ids.tolist(), pairs)
    assert got == want


def test_distributed_cc_no_pairs(ray_session):
    import ray.data as rd
    ids_ds = rd.from_arrow(pa.table({"doc_id": pa.array([5, 7, 9],
                                                        type=pa.int64())}))
    empty = rd.from_arrow(pa.table({"a": pa.array([], type=pa.int64()),
                                    "b": pa.array([], type=pa.int64())}))
    out = dedup.clusters_from_pairs_ds(ids_ds, empty).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == {5: 5, 7: 7, 9: 9}


def test_ngram_pairs_exact_jaccard(ray_session):
    """The distributed shingle-join pairs equal brute-force exact Jaccard."""
    import itertools
    import ray.data as rd
    from timezonemap_ray.stages.text import token_hashes
    tbl = _dup_corpus()
    ds = rd.from_arrow(tbl)
    got = dedup.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa = token_hashes(texts[a], pad=False)
        sb = token_hashes(texts[b], pad=False)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        if union and inter / union >= 0.5:
            want.add((a, b))
    assert got_pairs == want


def test_cluster_assign_routes_agree(ray_session):
    """cluster_assign: driver union-find route == forced-distributed route."""
    import ray.data as rd
    tbl = _dup_corpus()
    ds = rd.from_arrow(tbl)
    pairs = dedup.ngram_jaccard_pairs(ds, threshold=0.5)
    ids = ds.select_columns(["doc_id"])
    small = dedup.cluster_assign(ids, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup.cluster_assign(ids, pairs, driver_pair_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(small, dist, check_dtype=False)
    assert small["cluster_id"].iloc[0] == 0


def test_cluster_output_vectorized_matches_dict_path(ray_session):
    """_cluster_output_ds's searchsorted lookup == the reference dict path
    on mixed paired/unpaired/non-contiguous ids (incl. ids BETWEEN and
    BEYOND the paired keys, which exercise the searchsorted edge clamps)."""
    import pyarrow as pa
    import ray.data as rd
    pairs = {(10, 70), (70, 400), (55, 56)}
    all_ids = [3, 10, 11, 55, 56, 57, 70, 399, 400, 401, 10 ** 12]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(all_ids,
                                                    type=pa.int64())}))
    got = dedup._cluster_output_ds(ds, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    mapping = dedup.clusters_from_pairs(
        sorted({d for p in pairs for d in p}), pairs)
    for _, row in got.iterrows():
        want = mapping.get(row["doc_id"], row["doc_id"])
        assert row["cluster_id"] == want
        assert row["is_duplicate"] == (want != row["doc_id"])


def test_ngram_df_cap(ray_session):
    """df_cap drops stop-shingle groups: cap=1 kills all pairs; a generous
    cap reproduces the exact result."""
    import ray.data as rd
    ds = rd.from_arrow(_dup_corpus())
    exact = dedup.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    capped = dedup.ngram_jaccard_pairs(ds, threshold=0.5,
                                       df_cap=100).to_pandas()
    assert sorted(map(tuple, exact[["a", "b"]].values.tolist())) == \
        sorted(map(tuple, capped[["a", "b"]].values.tolist()))
    none = dedup.ngram_jaccard_pairs(ds, threshold=0.5, df_cap=1).to_pandas()
    assert none.empty or len(none) == 0


def test_minhash_dedup_duplicate_free_corpus(ray_session):
    """Regression: a corpus with NO shared band keys must return a clean
    all-singleton clustering, not crash on the empty-pairs path."""
    import ray.data as rd
    rows = [{"doc_id": i, "text": f"totally unique document number {i} "
             + " ".join(f"w{i}_{k}" for k in range(30))} for i in range(20)]
    out = dedup.minhash_dedup(rd.from_arrow(pa.Table.from_pylist(rows))) \
        .to_pandas()
    assert len(out) == 20
    assert (out["cluster_id"] == out["doc_id"]).all()
    assert not out["is_duplicate"].any()
    assert dedup.minhash_candidate_pairs(
        rd.from_arrow(pa.Table.from_pylist(rows))) == set()


def test_distributed_cc_raises_on_nonconvergence(ray_session):
    """A chain longer than max_iters must RAISE, not silently split."""
    import pytest as _pytest
    import ray.data as rd
    n = 12
    ids = rd.from_arrow(pa.table({"doc_id": pa.array(range(n),
                                                     type=pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "a": pa.array(range(n - 1), type=pa.int64()),
        "b": pa.array(range(1, n), type=pa.int64())}))
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.clusters_from_pairs_ds(ids, pairs, max_iters=3,
                                     shortcut=False)
    # with pointer shortcutting the same budget covers 2^3 hops → converges
    out = dedup.clusters_from_pairs_ds(ids, pairs, max_iters=3,
                                       shortcut=True).to_pandas()
    assert set(out["cluster_id"]) == {0}


def test_token_diversity_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    out = rd.read_parquet(docs_path, columns=["doc_id", "text"]) \
            .map_batches(text.token_diversity, batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
    sql = con.sql(r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
               len(list_distinct(regexp_extract_all(text, '\S+')))::BIGINT
                   AS n_distinct,
               len(list_distinct(regexp_extract_all(text, '\S+')))::DOUBLE
                 / greatest(len(regexp_extract_all(text, '\S+')), 1)
                   AS diversity
        FROM documents ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(out, sql)


def test_token_diversity_edges(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": ["", "   ", "a a a a", "a b c a"]})
    out = rd.from_arrow(t) \
        .map_batches(text.token_diversity, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens"].tolist() == [0, 0, 4, 4]
    assert out["n_distinct"].tolist() == [0, 0, 1, 3]
    assert out["diversity"].tolist() == [0.0, 0.0, 0.25, 0.75]


def test_minhash_md5_mode_matches_sql_twin(ray_session):
    """hash_fn="md5" end-to-end bit parity with oracle.minhash_dedup_sql
    on a corpus with exact dups, a near-dup, short and empty docs."""
    import ray.data as rd

    from timezonemap_ray.oracle import minhash_dedup_sql
    docs = pa.table({
        "doc_id": pa.array(range(8), type=pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely different content here about rivers and mountains",
            "the quick brown fox jumps over the lazy dog",
            "short",
            "",
            "rivers and mountains flow where content differs here",
            "the quick brown fox leaps over the lazy dog today",
        ]})
    got = dedup.minhash_dedup(rd.from_arrow(docs), hash_fn="md5") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con2 = duckdb.connect()
    con2.register("documents", docs)
    want = con2.execute(minhash_dedup_sql() + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(
        got[["doc_id", "cluster_id", "is_duplicate"]]
        .astype({"cluster_id": "int64"}),
        want.astype({"cluster_id": "int64"}))
    # exact dup pair clustered; near-dup (1 token changed) clustered too
    assert got.loc[3, "cluster_id"] == 0 and bool(got.loc[3, "is_duplicate"])
    assert got.loc[1, "cluster_id"] == 0


def test_minhash_md5_mode_same_recall_as_blake2b(ray_session, docs_path):
    """The two hash modes are different 64-bit hashes of the same shingle
    sets — the clustered PAIR SETS they produce on the test corpus agree
    (hash choice must not change which docs count as near-dups here)."""
    import ray.data as rd
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text"])

    def pairset(df):
        from collections import defaultdict
        comp = defaultdict(set)
        for d, c in zip(df["doc_id"], df["cluster_id"]):
            comp[c].add(d)
        return {frozenset((a, b)) for s in comp.values()
                for a in s for b in s if a < b}

    blake = dedup.minhash_dedup(ds).to_pandas()
    md5m = dedup.minhash_dedup(ds, hash_fn="md5").to_pandas()
    assert pairset(blake) == pairset(md5m)


def test_simhash_md5_mode_matches_sql_twin(ray_session):
    """hash_fn="md5" simhash dedup bit parity with oracle.simhash_dedup_sql
    (exact dups cluster; empty doc short-circuits to simhash 0)."""
    import ray.data as rd

    from timezonemap_ray.oracle import simhash_dedup_sql
    docs = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog and runs home",
            "completely different content here about rivers and mountains",
            "the quick brown fox jumps over the lazy dog and runs home",
            "tiny",
            "",
            "the quick brown fox jumps over the lazy dog and runs house",
        ]})
    got = dedup.simhash_dedup(rd.from_arrow(docs), hash_fn="md5") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con2 = duckdb.connect()
    con2.register("documents", docs)
    want = con2.execute(simhash_dedup_sql() + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(
        got[["doc_id", "cluster_id", "is_duplicate"]]
        .astype({"cluster_id": "int64"}),
        want.astype({"cluster_id": "int64"}))
    assert got.loc[2, "cluster_id"] == 0


def test_embedding_dedup_int_matches_sql_twin(ray_session):
    """Integer-exact embedding dedup: SQL bit parity on vectors with
    injected near-dups (cos > 0.95), a borderline pair, and negatives."""
    import duckdb
    import ray.data as rd

    from timezonemap_ray.oracle import embedding_dedup_int_sql
    rng = np.random.default_rng(4)
    base = rng.standard_normal((10, 16))
    vecs = list(base)
    vecs.append(base[0] + 0.01 * rng.standard_normal(16))  # near-dup of 0
    vecs.append(base[3] + 0.01 * rng.standard_normal(16))  # near-dup of 3
    vecs.append(-base[5])                                  # anti-parallel
    m = np.stack(vecs).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([r for r in m], type=pa.list_(pa.float32()))})
    got = dedup.embedding_dedup_int(rd.from_arrow(tbl), dim=16) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    con2 = duckdb.connect()
    con2.register("embeddings", tbl)
    want = con2.execute(embedding_dedup_int_sql(dim=16)
                        + " ORDER BY vec_id").df()
    pd.testing.assert_frame_equal(
        got[["vec_id", "cluster_id", "is_duplicate"]]
        .astype({"cluster_id": "int64"}),
        want.astype({"cluster_id": "int64"}))
    assert got.loc[10, "cluster_id"] == 0 and bool(got.loc[10, "is_duplicate"])
    assert got.loc[11, "cluster_id"] == 3
    assert not bool(got.loc[12, "is_duplicate"])  # anti-parallel ≠ near-dup


def test_embedding_dedup_int_agrees_with_float_path(ray_session):
    """The integer variant finds the same near-dup pair set as the float
    production path on well-separated synthetic data."""
    import ray.data as rd
    rng = np.random.default_rng(6)
    base = rng.standard_normal((20, 16))
    vecs = list(base) + [base[i] + 0.005 * rng.standard_normal(16)
                         for i in (1, 7)]
    m = np.stack(vecs).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([r for r in m], type=pa.list_(pa.float32()))})
    fl = dedup.embedding_dedup(rd.from_arrow(tbl), dim=16,
                               threshold=0.95).to_pandas()
    it = dedup.embedding_dedup_int(rd.from_arrow(tbl), dim=16).to_pandas()
    fl = fl.sort_values("vec_id").reset_index(drop=True)
    it = it.sort_values("vec_id").reset_index(drop=True)
    assert fl["cluster_id"].tolist() == it["cluster_id"].tolist()


def test_pack_chunks_docwise_recurrence():
    """Next-fit per doc: closed-form cases incl. oversized chunk and doc
    boundary resets."""
    t = pa.table({
        "doc_id": pa.array([1, 1, 1, 1, 2, 2, 3], type=pa.int64()),
        "chunk_idx": pa.array([0, 1, 2, 3, 0, 1, 0], type=pa.int64()),
        "n_tokens": pa.array([100, 100, 100, 50, 300, 10, 256],
                             type=pa.int64()),
    })
    out = text.pack_chunks_docwise(t, capacity=256).to_pandas()
    # doc 1: 100+100 fits (200), +100 exceeds → new bin; 100+50 fits
    assert out["pack_id"].tolist() == [0, 0, 1, 1, 0, 1, 0]
    assert out["pack_pos"].tolist() == [0, 1, 0, 1, 0, 0, 0]


def test_repetition_scores_edges(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "text": ["", "solo", "a a a a", "a b a b a", "x y z w"]})
    out = rd.from_arrow(t) \
        .map_batches(text.repetition_scores, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens"].tolist() == [0, 1, 4, 5, 4]
    assert out["top_token_frac"].tolist() == [0.0, 1.0, 1.0, 3 / 5, 0.25]
    assert out["n_bigrams"].tolist() == [0, 0, 3, 4, 3]
    # "a a a a": one distinct bigram repeated 3x
    assert out["dup_bigram_frac"].tolist() == [0.0, 0.0, 2 / 3, 0.5, 0.0]
    assert out["top_bigram_frac"].tolist() == [0.0, 0.0, 1.0, 0.5, 1 / 3]


def test_repetition_scores_batching_independent(ray_session, docs_path):
    """Per-doc statistics cannot depend on how docs are batched."""
    import ray.data as rd
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    one = ds.map_batches(text.repetition_scores, batch_format="pyarrow",
                         batch_size=1000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = ds.map_batches(text.repetition_scores, batch_format="pyarrow",
                          batch_size=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_chunk_documents_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    out = rd.read_parquet(docs_path, columns=["doc_id", "text"]) \
        .map_batches(lambda b: text.chunk_documents(b, chunk=12, stride=8),
                     batch_format="pyarrow") \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    sql = con.sql(r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
        idx AS (SELECT doc_id, toks, nt,
                       unnest(generate_series(0,
                         CASE WHEN nt <= 12 THEN 0
                              ELSE CAST(ceil((nt - 12) / 8.0) AS BIGINT)
                         END)) AS ci
                FROM n)
        SELECT doc_id, ci AS chunk_idx,
               array_to_string(toks[ci*8 + 1 : least(ci*8 + 12, nt)], ' ')
                   AS chunk_text,
               (least(ci*8 + 12, nt) - ci*8)::BIGINT AS n_tokens
        FROM idx ORDER BY doc_id, chunk_idx""").df()
    pd.testing.assert_frame_equal(out, sql)


def test_chunk_documents_edges(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": ["", "a b c", "  x  ", " ".join(
                      f"t{i}" for i in range(25))]})
    out = rd.from_arrow(t) \
        .map_batches(lambda b: text.chunk_documents(b, chunk=10, stride=10),
                     batch_format="pyarrow") \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    # doc1: no tokens → no chunks; doc2: 1 chunk; doc3: 1; doc4: 25 toks,
    # no overlap (stride=chunk=10) → ceil(15/10)+1 = 3 chunks (10,10,5)
    assert out[out.doc_id == 1].empty
    assert out[out.doc_id == 2]["chunk_text"].tolist() == ["a b c"]
    assert out[out.doc_id == 3]["chunk_text"].tolist() == ["x"]
    d4 = out[out.doc_id == 4]
    assert d4["n_tokens"].tolist() == [10, 10, 5]
    assert d4["chunk_text"].iloc[2] == "t20 t21 t22 t23 t24"


def test_pack_sequences_invariants(ray_session):
    rng = np.random.default_rng(6)
    lens = rng.integers(1, 200, size=500).astype(np.int64)
    t = pa.table({"chunk": pa.array(np.arange(500, dtype=np.int64)),
                  "n_tokens": pa.array(lens)})
    out = text.pack_sequences(t, capacity=256)
    df = out.to_pandas()
    # every chunk packed exactly once, capacity never exceeded
    assert len(df) == 500
    per_bin = df.groupby("pack_id")["n_tokens"].sum()
    assert (per_bin <= 256).all()
    # pack_pos is a dense 0..k-1 sequence within each bin
    for _, g in df.groupby("pack_id"):
        assert sorted(g["pack_pos"]) == list(range(len(g)))
    # FFD fill quality: mean fill of non-trailing bins is high
    assert per_bin.mean() > 0.8 * 256
    # deterministic
    df2 = text.pack_sequences(t, capacity=256).to_pandas()
    assert df.equals(df2)


def test_pack_sequences_oversized_and_empty(ray_session):
    t = pa.table({"n_tokens": pa.array([600, 5], type=pa.int64())})
    df = text.pack_sequences(t, capacity=256).to_pandas()
    assert df["pack_id"].nunique() == 2  # oversize gets its own bin
    empty = text.pack_sequences(t.slice(0, 0), capacity=256)
    assert empty.num_rows == 0 and "pack_id" in empty.column_names


def test_duplicated_spans_matches_sql(ray_session, docs_path, con):
    import ray.data as rd
    got = dedup.duplicated_spans(
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .repartition(4), window=20, stride=10) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    sql = con.sql(r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        nn AS (SELECT doc_id, toks, len(toks) AS nt FROM t
               WHERE len(toks) > 0),
        idx AS (SELECT doc_id, toks, nt, unnest(generate_series(0,
                  CASE WHEN nt <= 20 THEN 0
                       ELSE CAST(ceil((nt - 20) / 10.0) AS BIGINT)
                  END)) AS ci FROM nn),
        w AS (SELECT doc_id, ci,
                     array_to_string(toks[ci*10 + 1 : least(ci*10+20, nt)],
                                     ' ') AS wt,
                     (least(ci*10 + 20, nt) - ci*10)::BIGINT AS n_tokens
              FROM idx),
        d AS (SELECT wt FROM (SELECT wt, count(DISTINCT doc_id) AS nd
                              FROM w GROUP BY wt) WHERE nd >= 2)
        SELECT w.doc_id, w.ci AS chunk_idx, w.n_tokens
        FROM w JOIN d USING (wt)
        ORDER BY doc_id, chunk_idx""").df()
    pd.testing.assert_frame_equal(got, sql)
    assert len(got) > 0  # testdata contains exact-dup docs → shared spans


def test_duplicated_spans_no_dups(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["completely unique words one",
                           "another totally different set"]})
    out = dedup.duplicated_spans(rd.from_arrow(t), window=3, stride=2)
    assert out.count() == 0


def test_duplicated_spans_string_ids(ray_session):
    import ray.data as rd
    shared = " ".join(f"s{i}" for i in range(8))
    t = pa.table({"uid": pa.array(["a", "b", "c"]),
                  "text": [shared, shared, "nothing in common here"]})
    out = dedup.duplicated_spans(rd.from_arrow(t).repartition(2),
                                 window=8, stride=4, id_col="uid") \
        .to_pandas()
    assert sorted(out["uid"].unique()) == ["a", "b"]


def test_redact_text_masks_and_counts(ray_session):
    import pyarrow as pa
    from timezonemap_ray.stages.text import REDACT_PATTERNS, redact_text
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "mail me at bob.smith+x@example.co.uk today",
            "card 12345678 and pin 123 stay",   # only the 7+ digit run masked
            "nothing sensitive here",
            "two mails a@b.io c@d.org and 9999999",
        ]),
    })
    out = redact_text(tbl)
    texts = out["clean_text"].to_pylist()
    assert texts[0] == "mail me at [EMAIL] today"
    assert texts[1] == "card [NUMBER] and pin 123 stay"
    assert texts[2] == "nothing sensitive here"
    assert texts[3] == "two mails [EMAIL] [EMAIL] and [NUMBER]"
    assert out["n_redacted"].to_pylist() == [1, 1, 0, 3]
    assert out.schema.field("n_redacted").type == pa.int64()
    # custom blocklist rule chains after the defaults
    out2 = redact_text(tbl, patterns=REDACT_PATTERNS
                       + ((r"\b(stay|today)\b", "[MASKED]"),))
    assert out2["clean_text"].to_pylist()[0].endswith("[MASKED]")
    assert out2["n_redacted"].to_pylist() == [2, 2, 0, 3]


def test_fuzzy_pairs_lev1_matches_bruteforce(ray_session):
    import itertools
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.dedup import _lev_le1, fuzzy_pairs_lev1
    names = ["alpha", "alphA", "alpa", "alpha!", "beta", "betta", "bta",
             "gamma", "gamm", "gamme", "delta", "alphaa", "ab", "ba", "a",
             "", "x", "xy", "alpha"]  # incl. exact dup, empty, swaps
    tbl = pa.table({"id": pa.array(range(len(names)), type=pa.int64()),
                    "name": pa.array(names)})
    got = fuzzy_pairs_lev1(rd.from_arrow(tbl).repartition(4), "id", "name") \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def lev(a, b):  # full DP reference
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    want = sorted((i, j) for i, j in itertools.combinations(
        range(len(names)), 2) if lev(names[i], names[j]) <= 1)
    assert list(map(tuple, got[["id_a", "id_b"]].to_numpy())) == want
    # swap pairs ("ab","ba") share deletion sigs but are distance 2 —
    # must be verified away
    assert (12, 13) not in set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    # _lev_le1 agrees with the DP on every pair
    for a, b in itertools.combinations(names, 2):
        assert _lev_le1(a, b) == (lev(a, b) <= 1), (a, b)


def test_mask_tokens_matches_duckdb_and_edges(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from timezonemap_ray.stages.text import mask_sql_pred, mask_tokens
    rng = np.random.default_rng(4)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(vocab[int(j)] for j in rng.integers(0, 4, int(n)))
             for n in rng.integers(0, 40, 150)]
    texts[0] = ""          # no tokens
    texts[1] = None        # null text → null outputs
    texts[2] = "  x  y  "  # ragged whitespace canonicalizes
    tbl = pa.table({"doc_id": pa.array(range(150), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    got = mask_tokens(tbl, rate_bp=2000).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    pred = mask_sql_pred("doc_id", "i", 2000)
    want = con.execute(rf"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                      FROM documents)
        SELECT doc_id,
               CASE WHEN l IS NULL THEN NULL ELSE coalesce(
                   array_to_string(list_transform(l, (t, i) ->
                   CASE WHEN {pred} THEN '<mask>' ELSE t END), ' '), '') END
                   AS masked_text,
               len(list_filter(l, (t, i) -> {pred}))::BIGINT AS n_masked
        FROM toks ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["masked_text"][0] == "" and got["n_masked"][0] == 0
    assert got["masked_text"][1] is None or pd.isna(got["masked_text"][1])
    # empirical mask rate near 20%
    total = sum(len(t.split()) for t in got["masked_text"].dropna())
    assert abs(got["n_masked"].dropna().sum() / max(total, 1) - 0.2) < 0.04
    # determinism across runs
    again = mask_tokens(tbl, rate_bp=2000).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_feature_hash_vectors_properties(ray_session):
    import numpy as np
    import pyarrow as pa
    from timezonemap_ray.stages.text import feature_hash_vectors
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a b c a", "a b c a", "x y z w q",
                          "", "a b c a d"]),
    })
    out = feature_hash_vectors(t, dim=64)
    v = np.array(out["embedding"].to_pylist(), dtype=np.float64)
    assert v.shape == (5, 64)
    assert np.allclose(v[0], v[1])                       # content-stable
    assert not np.allclose(v[0], v[2])                   # discriminative
    assert np.allclose(np.linalg.norm(v[[0, 1, 2, 4]], axis=1), 1.0)
    assert np.allclose(v[3], 0.0)                        # empty doc → 0
    assert float(v[0] @ v[4]) > 0.9                      # near-dup close
    # block-split stability: same vectors regardless of batching
    a = feature_hash_vectors(t.slice(0, 2), dim=64)["embedding"].to_pylist()
    assert np.allclose(np.array(a[0]), v[0])


def test_merge_spans_gaps_and_islands(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.spans import merge_spans
    tbl = pa.table({
        "doc_id": pa.array([1, 1, 1, 1, 2, 2, 3], type=pa.int64()),
        # doc 1: [0,20)+[10,30) merge; [30,50) touches → merge; [60,70) gap
        # doc 2: containment [0,100) ⊃ [10,20) merges into one
        "s": pa.array([0, 10, 30, 60, 0, 10, 5], type=pa.int64()),
        "e": pa.array([20, 30, 50, 70, 100, 20, 9], type=pa.int64()),
    })
    out = merge_spans(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas().sort_values(["doc_id", "span_start"]) \
        .reset_index(drop=True)
    got = list(map(tuple, out.to_numpy()))
    assert got == [(1, 0, 50, 3), (1, 60, 70, 1),
                   (2, 0, 100, 2), (3, 5, 9, 1)]


def test_remove_duplicated_spans_end_to_end(ray_session):
    """Injected cross-doc duplicate region is cut from every holder;
    unique text survives verbatim (canonicalized); no-dup docs pass
    through with n_removed = 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.dedup import remove_duplicated_spans
    dup = " ".join(f"dup{i}" for i in range(25))       # > window tokens
    # duplicates must be WINDOW-ALIGNED (stride grid) to be detected —
    # the documented contract of the windowed detector (a suffix-array
    # detector would catch unaligned dups; out of scope)
    texts = [
        f"{dup} unique one tail",
        f"{dup} closing words here",
        "completely original text " + " ".join(f"u{i}" for i in range(30)),
    ]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(texts)})
    out = remove_duplicated_spans(rd.from_arrow(tbl).repartition(2),
                                  window=20, stride=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[2, "clean_text"] == texts[2]
    # the duplicated block is gone from both holders
    for r in (0, 1):
        assert out.loc[r, "n_removed"] > 0
        assert "dup0" not in out.loc[r, "clean_text"]
    # unique tokens outside merged windows survive
    assert "unique" in out.loc[0, "clean_text"] or \
        out.loc[0, "n_removed"] >= 25
    assert "closing" in out.loc[1, "clean_text"] or \
        out.loc[1, "n_removed"] >= 25


def test_duplicated_spans_stride1_catches_unaligned(ray_session):
    """stride=1 detects a duplicate at ANY offset — the case the stride
    grid misses (cf. test_remove_duplicated_spans_end_to_end's alignment
    contract)."""
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.dedup import duplicated_spans
    dup = " ".join(f"dup{i}" for i in range(25))
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            f"{dup} unique one tail",
            f"off grid {dup} closing words",   # offset 2: grid-misaligned
            "completely original " + " ".join(f"u{i}" for i in range(30)),
        ])})
    ds = rd.from_arrow(tbl).repartition(2)
    aligned = duplicated_spans(ds, window=20, stride=10).to_pandas()
    exact = duplicated_spans(ds, window=20, stride=1).to_pandas()
    assert len(aligned) == 0                       # grid misses it
    assert set(exact["doc_id"]) == {0, 1}          # stride=1 finds both
    assert 2 not in set(exact["doc_id"])


def test_fuzzy_pairs_qgram_k3_matches_bruteforce(ray_session):
    """q-gram prefix-filter blocking (Ed-Join shape) at k=3 is EXACT vs
    brute-force banded Levenshtein — planted 3-edit variants, short
    strings below the overlap bound, empties, duplicates."""
    import itertools
    import string

    import ray.data as rd
    rng = np.random.default_rng(0)
    names = ["alpha", "alpXYZ", "alXha", "alp", "alphaXY", "beta", "bXtYZ",
             "ab", "ba", "", "x", "xyz", "axc", "cxa", "alpha", "gamma",
             "gXmYa", "qq", "delta-one", "delta0ne!"]
    for i in range(80):
        base = "".join(rng.choice(list(string.ascii_lowercase), 12))
        names.append(base)
        if i % 5 == 0:
            v = list(base)
            for _ in range(3):
                op = rng.integers(0, 3)
                p = int(rng.integers(0, len(v)))
                if op == 0 and len(v) > 1:
                    v.pop(p)
                elif op == 1:
                    v.insert(p, "Z")
                else:
                    v[p] = "Q"
            names.append("".join(v))
    tbl = pa.table({"id": pa.array(range(len(names)), type=pa.int64()),
                    "name": pa.array(names)})
    got = dedup.fuzzy_pairs_qgram(rd.from_arrow(tbl).repartition(4),
                                  "id", "name", k=3).to_pandas()
    gp = sorted(map(tuple, got[["id_a", "id_b"]].values.tolist()))

    def lev(a, b):
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = d.copy()
            d[0] = i
            for j, cb in enumerate(b, 1):
                d[j] = min(prev[j] + 1, d[j - 1] + 1,
                           prev[j - 1] + (ca != cb))
        return d[len(b)]

    want = sorted((i, j) for i, j in
                  itertools.combinations(range(len(names)), 2)
                  if lev(names[i], names[j]) <= 3)
    assert gp == want


def test_verify_pairs_hamming_fastpath():
    """_verify_pairs: equal-length hamming ≤ k accepts without DP; the
    shift case (hamming > k but lev ≤ k) still verifies via DP; unicode
    names are safe."""
    na = ["abcdef", "abcdef", "héllo!", "abc"]
    nb = ["abQdQf", "bcdefa", "héllQ!", "abcdefg"]
    ok = dedup._verify_pairs(na, nb, 2)
    #  subs=2 ✓ | shift lev=2, hamming=6 ✓ | unicode sub=1 ✓ | lendiff=4 ✗
    assert ok.tolist() == [True, True, True, False]


def test_rolling_spans_equal_md5_stride1(ray_session):
    """duplicated_spans_rolling (token-hash + O(1)/position rolling
    double-hash) emits EXACTLY duplicated_spans(stride=1)'s rows —
    planted duplicates at odd offsets, short docs, a full-doc duplicate,
    and a null text row."""
    import ray.data as rd
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(300)]
    docs = [" ".join(rng.choice(vocab, int(rng.integers(0, 120))))
            for _ in range(120)]
    shared = " ".join(rng.choice(vocab, 35))
    docs[3] = docs[3] + " " + shared
    docs[77] = "xx yy " + shared + " zz"     # unaligned offset
    docs[50] = docs[60]                      # full-doc duplicate
    docs.append(None)
    tbl = pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
                    "text": pa.array(docs)})
    a = dedup.duplicated_spans(rd.from_arrow(tbl).repartition(5),
                               window=20, stride=1).to_pandas()
    b = dedup.duplicated_spans_rolling(rd.from_arrow(tbl).repartition(5),
                                       window=20).to_pandas()

    def key(df):
        return sorted(map(tuple,
                          df[["doc_id", "chunk_idx", "n_tokens"]]
                          .values.tolist()))

    assert key(a) == key(b) and len(b) > 0


def test_rolling_spans_hashing_volume(monkeypatch):
    """The digest-volume bound (VERDICT #8): the rolling detector performs
    at most ONE content hash per distinct token — never one per window
    position over window-length strings (the md5-path blowup)."""
    calls = {"n": 0}
    real = text.hash_u64

    def counting(s):
        calls["n"] += 1
        return real(s)

    monkeypatch.setattr(text, "hash_u64", counting)
    rng = np.random.default_rng(1)
    vocab = [f"t{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, 200)) for _ in range(20)]
    tbl = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                    "text": pa.array(docs)})
    doc_of, cidx, ln, h1, h2 = dedup._rolling_window_digests(tbl, 20, "text")
    n_tokens = 20 * 200
    n_positions = doc_of.size
    assert n_positions == 20 * (200 - 20 + 1)
    # ≤ one hash per DISTINCT token (50 here) — ≪ tokens ≪ positions×window
    assert calls["n"] <= 50
    assert calls["n"] < n_tokens
    # digests really distinguish content: identical windows collide,
    # different windows don't (within this corpus)
    import collections
    seen = collections.defaultdict(set)
    toks = [d.split() for d in docs]
    for w in range(n_positions):
        d = int(doc_of[w]); i = int(cidx[w])
        seen[(int(h1[w]), int(h2[w]))].add(" ".join(toks[d][i:i + 20]))
    assert all(len(v) == 1 for v in seen.values())


def test_fuzzy_pairs_k2_matches_bruteforce(ray_session):
    import itertools
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.dedup import fuzzy_pairs
    names = ["alpha", "alpXY", "alXha", "alp", "alphaXY", "beta", "bXtY",
             "ab", "ba", "", "x", "xyz", "axc", "cxa", "alpha"]
    tbl = pa.table({"id": pa.array(range(len(names)), type=pa.int64()),
                    "name": pa.array(names)})
    got = fuzzy_pairs(rd.from_arrow(tbl).repartition(4), "id", "name",
                      k=2).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def lev(a, b):
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    want = sorted((i, j) for i, j in itertools.combinations(
        range(len(names)), 2) if lev(names[i], names[j]) <= 2)
    assert list(map(tuple, got[["id_a", "id_b"]].to_numpy())) == want


def test_cluster_output_string_ids(ray_session):
    """Regression (r4 review): non-integer id columns route to the
    dict-lookup path — same semantics as the int64 searchsorted path."""
    import pyarrow as pa
    import ray.data as rd
    pairs = {("a", "b"), ("b", "x")}
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(
        ["a", "b", "m", "x", "z"])}))
    got = dedup._cluster_output_ds(ds, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["cluster_id"].tolist() == ["a", "a", "m", "a", "z"]
    assert got["is_duplicate"].tolist() == [False, True, False, True, False]


def test_semantic_dedup_int_matches_sql_twin(ray_session):
    """SemDeDup integer twin: SQL bit parity on separable clusters with
    injected within-cluster near-dups, at two partitionings."""
    import ray.data as rd

    from timezonemap_ray.oracle import semantic_dedup_int_sql
    rng = np.random.default_rng(11)
    centers = np.array([[0.6, 0.0, 0.0, 0.0], [0.0, 0.6, 0.0, 0.0],
                        [0.0, 0.0, 0.6, 0.0]])
    pts = np.concatenate([c + 0.25 * rng.standard_normal((15, 4))
                          for c in centers])
    # near-dups of rows 0 and 20 (same direction => cosine ~ 1)
    pts = np.concatenate([pts, pts[[0]] * 1.02 + 0.001,
                          pts[[20]] * 0.98 - 0.001])
    m = pts.astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
        "embedding": pa.array([r for r in m], type=pa.list_(pa.float32()))})
    con2 = duckdb.connect()
    con2.register("embeddings", tbl)
    # tau^2 = 9025/10000 (tau = 0.95): drops the injected near-parallel
    # pairs plus a handful of organic in-cluster ones
    want = con2.execute(
        semantic_dedup_int_sql(k=3, kmeans_iters=2, threshold_num=9025,
                               threshold_den=10000)
        + " ORDER BY vec_id").df()
    for parts in (1, 5):
        got = dedup.semantic_dedup_int(
            rd.from_arrow(tbl).repartition(parts), k=3, kmeans_iters=2,
            threshold_num=9025, threshold_den=10000).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # the injected near-dups are gone (45's base 0 survives; 46's base 20
    # is itself organically deduped by a lower-id neighbor), and the
    # dedup is non-trivial in both directions
    kept = set(got["vec_id"])
    assert 0 in kept
    assert 45 not in kept and 46 not in kept
    assert 2 < len(kept) < len(m)


def test_semantic_dedup_int_overflow_backstop_matches_sql(ray_session):
    """Vectors large enough to fail the int64 product guard route to the
    arbitrary-precision pair loop — still bit-equal to the HUGEINT SQL."""
    import ray.data as rd

    from timezonemap_ray.oracle import semantic_dedup_int_sql
    rng = np.random.default_rng(13)
    base = 600.0 * rng.standard_normal((12, 8))  # |x|*1000 ~ 6e5 per dim
    vecs = np.concatenate([base, base[[2]] * 1.01])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
        "embedding": pa.array([r for r in vecs.astype(np.float32)],
                              type=pa.list_(pa.float32()))})
    # guard must actually trip: den*max_na^2 >= 2^63
    q = np.floor(vecs.astype(np.float64) * 1000.0).astype(np.int64)
    mx = int((q * q).sum(axis=1).max())
    assert 100 * mx * mx >= 1 << 63
    con2 = duckdb.connect()
    con2.register("embeddings", tbl)
    want = con2.execute(
        semantic_dedup_int_sql(k=2, kmeans_iters=1, threshold_num=81,
                               threshold_den=100)
        + " ORDER BY vec_id").df()
    got = dedup.semantic_dedup_int(
        rd.from_arrow(tbl), k=2, kmeans_iters=1,
        threshold_num=81, threshold_den=100).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert 12 not in set(got["vec_id"])  # the scaled copy of row 2


def test_semantic_dedup_int_rule_is_pair_local_not_closure(ray_session):
    """Documented keep rule: drop j iff a DIRECT lower-id near-dup
    exists. A chain 1-3, 2-3 (1 and 2 dissimilar) keeps {1, 2} — a
    closure rule would keep only {1}."""
    import ray.data as rd
    v1 = np.array([1.0, 0.0], dtype=np.float32)
    v2 = np.array([0.0, 1.0], dtype=np.float32)
    v3 = (v1 + v2) / np.sqrt(2.0)  # cos(v3, v1) = cos(v3, v2) ~ 0.707
    tbl = pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
        "embedding": pa.array([v1, v2, v3.astype(np.float32)],
                              type=pa.list_(pa.float32()))})
    # tau^2 = 49/100 (tau = 0.7): 3 is a near-dup of both 1 and 2
    got = dedup.semantic_dedup_int(
        rd.from_arrow(tbl), k=1, kmeans_iters=1,
        threshold_num=49, threshold_den=100).to_pandas()
    assert sorted(got["vec_id"]) == [1, 2]


def test_window_dedup_events_matches_lag_twin(ray_session):
    """window_dedup_events ≡ the SQL lag() rule on a synthetic stream
    with ts ties, cross-block keys, exact-window gaps, and singletons."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 4000
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    ts_us = base + rng.integers(0, 3_600_000_000 * 8, n)
    ts_us[100] = ts_us[101]  # exact tie on one key
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),
        "event_type": rng.choice(["click", "view", "buy"], n),
        "ts": pd.to_datetime(ts_us, unit="us"),
    })
    # force one exactly-at-window gap (inclusive boundary) and one just over
    df.loc[0, ["user_id", "event_type"]] = [999, "edge"]
    df.loc[1, ["user_id", "event_type"]] = [999, "edge"]
    df.loc[0, "ts"] = pd.Timestamp("2025-01-01")
    df.loc[1, "ts"] = pd.Timestamp("2025-01-01") + pd.Timedelta(hours=1)
    df.loc[2, ["user_id", "event_type"]] = [998, "edge"]
    df.loc[3, ["user_id", "event_type"]] = [998, "edge"]
    df.loc[2, "ts"] = pd.Timestamp("2025-01-01")
    df.loc[3, "ts"] = (pd.Timestamp("2025-01-01") + pd.Timedelta(hours=1)
                       + pd.Timedelta(microseconds=1))
    df.loc[4, ["user_id", "event_type"]] = [997, "solo"]  # singleton key

    got = dedup.window_dedup_events(
        rd.from_pandas(df).repartition(7)).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)

    con2 = duckdb.connect()
    con2.register("events", df)
    want = con2.sql("""
        WITH p AS (
          SELECT event_id, user_id, event_type, ts,
                 lag(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS pts
          FROM events)
        SELECT event_id, user_id, event_type,
               CAST(date_diff('microsecond', pts, ts) AS BIGINT) AS gap_us
        FROM p
        WHERE pts IS NOT NULL
          AND date_diff('microsecond', pts, ts) <= 3600000000
        ORDER BY event_id""").df()
    assert 0 in got["event_id"].values or 1 in got["event_id"].values
    assert 3 not in want["event_id"].values  # just-over-window excluded
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "event_type", "gap_us"]],
        want[["event_id", "user_id", "event_type", "gap_us"]])
