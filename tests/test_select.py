"""Selection operators: exact quantiles (vs DuckDB quantile_disc and a
driver-side sort), deterministic hash sampling, top-k per group."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from timezonemap_ray.stages.select import (
    quantile_exact, sample_hash, sample_hash_sql_pred, topk_per_group)


def _ds(tbl, blocks=8):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(blocks)


def test_quantile_exact_matches_duckdb(ray_session):
    rng = np.random.default_rng(5)
    # mixed distribution incl. heavy duplicates and negative values
    v = np.concatenate([rng.uniform(-50, 150, 40_000),
                        np.full(15_000, 42.0),          # dup spike
                        rng.normal(0, 1e-9, 5_000)])    # sub-ulp-ish cluster
    rng.shuffle(v)
    tbl = pa.table({"value": pa.array(v)})
    qs = [0.0, 0.01, 0.1, 0.5, 0.62, 0.9, 0.99, 1.0]
    got = quantile_exact(_ds(tbl), "value", qs).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    for q, val in zip(got["q"], got["value"]):
        want = con.execute(
            f"SELECT quantile_disc(value, {q}) FROM t").fetchone()[0]
        assert val == want, (q, val, want)


def test_quantile_exact_all_equal_and_nan(ray_session):
    v = np.full(10_000, 7.5)
    v[::7] = np.nan  # NaN ignored, like SQL nulls
    tbl = pa.table({"value": pa.array(v)})
    got = quantile_exact(_ds(tbl), "value", [0.25, 0.75]).to_pandas()
    assert (got["value"] == 7.5).all()


def test_kth_smallest_adversarial_distributions(ray_session):
    """Histogram-selection edge cases vs np.sort, with exact_cap forced
    tiny so every case exercises the refinement loop (not the small-n
    pull): denormals, 1e300 ranges, ±inf sentinels, duplicate spikes,
    single-value columns, sub-ulp clusters."""
    from timezonemap_ray.stages.select import kth_smallest
    rng = np.random.default_rng(3)
    cases = {
        "uniform": rng.uniform(-1e6, 1e6, 20000),
        "denormal": rng.uniform(0, 1, 8000) * 5e-324
        * rng.integers(1, 100, 8000),
        "huge_range": np.concatenate([rng.uniform(-1e300, 1e300, 5000),
                                      rng.uniform(-1, 1, 5000)]),
        "two_values": np.where(rng.random(9000) < 0.7, 3.25, -1.5),
        "one_value": np.full(5000, 1e-9),
        "dup_heavy": np.concatenate([np.full(9000, 5.0),
                                     rng.uniform(0, 10, 1000)]),
        "with_inf": np.concatenate([rng.uniform(-10, 10, 8000),
                                    [np.inf] * 50, [-np.inf] * 30]),
        "ulp_cluster": 1.0 + rng.integers(0, 5, 8000) * 2.0 ** -52,
    }
    for name, v in cases.items():
        rng.shuffle(v)
        tbl = pa.table({"value": pa.array(v.astype(np.float64))})
        n = v.size
        ks = sorted({0, 1, n // 2, n - 2, n - 1})
        got = kth_smallest(_ds(tbl, blocks=4), "value", ks, exact_cap=256)
        sv = np.sort(v)
        for k in ks:
            assert got[k] == sv[k], (name, k, got[k], sv[k])


def test_sample_hash_matches_sql_predicate(ray_session):
    ids = np.arange(50_000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "x": pa.array(ids * 2)})
    got = sample_hash(_ds(tbl), "doc_id", 1000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT * FROM t WHERE {sample_hash_sql_pred('doc_id', 1000)} "
        f"ORDER BY doc_id").df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # ~10% +- sampling noise of the deterministic hash
    assert 0.08 < len(got) / len(ids) < 0.12


def test_topk_per_group_exact(ray_session):
    rng = np.random.default_rng(9)
    n = 30_000
    tbl = pa.table({
        "user_id": pa.array(rng.integers(0, 500, n).astype(np.int64)),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(rng.uniform(0, 100, n))})
    got = topk_per_group(_ds(tbl), "user_id", "value", 3, "event_id") \
        .to_pandas().sort_values(["user_id", "event_id"]) \
        .reset_index(drop=True)
    pdf = tbl.to_pandas()
    pdf["rn"] = pdf.sort_values(["value", "event_id"],
                                ascending=[False, True]) \
        .groupby("user_id").cumcount()
    want = pdf[pdf["rn"] < 3].drop(columns="rn") \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_quantile_matches_duckdb(ray_session):
    """Per-group quantile_disc parity on a string group key, incl. NaN
    rows (dropped) and single-row groups."""
    from timezonemap_ray.stages.select import grouped_quantile
    rng = np.random.default_rng(12)
    n = 20_000
    grp = rng.choice(["alpha", "beta", "gamma", "lonely"], n,
                     p=[0.45, 0.3, 0.2499, 0.0001])
    v = rng.uniform(-10, 10, n)
    v[::11] = np.nan
    tbl = pa.table({"g": pa.array(grp), "value": pa.array(v)})
    got = grouped_quantile(_ds(tbl), "g", "value", [0.5, 0.95]) \
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT g, 0.5 AS q, quantile_disc(value, 0.5) AS value
        FROM t WHERE NOT isnan(value) GROUP BY g
        UNION ALL
        SELECT g, 0.95, quantile_disc(value, 0.95)
        FROM t WHERE NOT isnan(value) GROUP BY g
        ORDER BY g, q""").df().reset_index(drop=True)
    assert got["g"].tolist() == want["g"].tolist()
    assert got["q"].tolist() == want["q"].tolist()
    assert got["value"].tolist() == want["value"].tolist()


def test_grouped_quantile_null_group_keys(ray_session):
    """NULL group keys form their own group (SQL GROUP BY semantics);
    object-array sorting with None used to crash (probe-found)."""
    import ray.data as rd
    from timezonemap_ray.stages.select import grouped_quantile
    tbl = pa.table({"g": pa.array(["a", None, "b", "a", None, "b", "a"]),
                    "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])})
    out = grouped_quantile(rd.from_arrow(tbl).repartition(2),
                           "g", "value", [0.5]).to_pandas()
    by_g = {(g if isinstance(g, str) else None): v
            for g, v in zip(out["g"], out["value"])}
    assert by_g == {"a": 4.0, "b": 3.0, None: 2.0}


def test_grouped_quantile_hot_group_routing(ray_session):
    """`hot_group_rows` routes oversized groups through the scan-based
    quantile_exact path (the salting escape hatch for the one-group-per-
    partition contract) — results must be identical to the plain shuffle
    path, including a NULL group that is itself hot."""
    import ray.data as rd
    from timezonemap_ray.stages.select import grouped_quantile
    rng = np.random.default_rng(44)
    n = 30_000
    grp = rng.choice(["whale", "m1", "m2", None], n,
                     p=[0.85, 0.05, 0.05, 0.05])  # whale + null both hot
    v = rng.uniform(-100, 100, n)
    v[::17] = np.nan
    tbl = pa.table({"g": pa.array(grp), "value": pa.array(v)})
    ds = rd.from_arrow(tbl).repartition(8)
    qs = [0.1, 0.5, 0.99]
    plain = grouped_quantile(ds, "g", "value", qs) \
        .to_pandas()
    hot = grouped_quantile(ds, "g", "value", qs, hot_group_rows=1200) \
        .to_pandas()
    key = lambda df: {(g if isinstance(g, str) else None, q): v
                      for g, q, v in zip(df["g"], df["q"], df["value"])}
    assert key(hot) == key(plain)
    assert len(hot) == len(plain) == 4 * len(qs)


def test_grouped_quantile_hot_all_nan_group(ray_session):
    """A hot group whose values are ALL NaN must emit no rows (matching
    the shuffle path), and a threshold that no group exceeds must leave
    results unchanged."""
    import ray.data as rd
    from timezonemap_ray.stages.select import grouped_quantile
    tbl = pa.table({
        "g": pa.array(["dead"] * 50 + ["ok"] * 5),
        "value": pa.array([np.nan] * 50 + [1.0, 2.0, 3.0, 4.0, 5.0])})
    ds = rd.from_arrow(tbl).repartition(3)
    out = grouped_quantile(ds, "g", "value", [0.5],
                           hot_group_rows=10).to_pandas()
    assert out["g"].tolist() == ["ok"] and out["value"].tolist() == [3.0]
    cold = grouped_quantile(ds, "g", "value", [0.5],
                            hot_group_rows=10**9).to_pandas()
    assert cold["g"].tolist() == ["ok"] and cold["value"].tolist() == [3.0]


def test_group_row_counts_null_and_string_keys(ray_session):
    """group_row_counts: per-block combiner + hash-partition merge gives
    exact per-group row counts for string keys incl. NULL."""
    import ray.data as rd
    from timezonemap_ray.stages.select import group_row_counts
    tbl = pa.table({"g": pa.array(["a"] * 7 + ["b"] * 3 + [None] * 2)})
    got = dict(group_row_counts(rd.from_arrow(tbl).repartition(4), "g"))
    assert got == {"a": 7, "b": 3, None: 2}


def test_distinct_per_group_matches_duckdb(ray_session):
    """Exact per-group COUNT(DISTINCT value) with string groups, null
    groups (their own group) and null values (not counted)."""
    from timezonemap_ray.stages.select import distinct_per_group
    rng = np.random.default_rng(31)
    n = 15_000
    grp = rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.25, 0.05])
    val = rng.integers(0, 500, n).astype("float64")
    val[::13] = np.nan
    tbl = pa.table({"g": pa.array(grp),
                    "v": pa.array([None if np.isnan(x) else int(x)
                                   for x in val], type=pa.int64())})
    got = distinct_per_group(_ds(tbl), "g", "v").to_pandas()
    got_map = {(g if isinstance(g, str) else None): int(c)
               for g, c in zip(got["g"], got["n_distinct"])}
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT g, COUNT(DISTINCT v) AS n FROM t GROUP BY g").df()
    want_map = {(g if isinstance(g, str) else None): int(c)
                for g, c in zip(want["g"], want["n"])}
    assert got_map == want_map


def test_list_column_to_matrix_paths():
    """Fast flatten+reshape path for equal-width list / fixed-size-list
    columns equals the to_pylist fallback; ragged and null-bearing columns
    route to the fallback unchanged."""
    from timezonemap_ray.vecs import list_column_to_matrix
    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    lst = pa.array(m.tolist(), type=pa.list_(pa.float64()))
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(m.ravel(), type=pa.float64()), 3)
    chunked = pa.chunked_array([lst.slice(0, 2), lst.slice(2, 2)])
    for col in (lst, fsl, chunked, lst.slice(1, 2)):
        got = list_column_to_matrix(col)
        want = np.array(col.to_pylist() if not isinstance(col, pa.ChunkedArray)
                        else col.combine_chunks().to_pylist())
        assert got.shape == want.shape and (got == want).all()
    import pytest
    withnull = pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                        type=pa.list_(pa.float64()))
    with pytest.raises(Exception):  # outer null: no silent wrong matrix
        list_column_to_matrix(withnull)
    inner_null = pa.array([[1.0, None], [2.0, 3.0]],
                          type=pa.list_(pa.float64()))
    with pytest.raises(Exception):  # INNER null: was a silent NaN row
        list_column_to_matrix(inner_null)
    fsl_inner = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, None, 2.0, 3.0], type=pa.float64()), 2)
    with pytest.raises(Exception):
        list_column_to_matrix(fsl_inner)


def test_topk_per_group_string_and_null_keys(ray_session):
    """Group keys may be strings and may contain nulls (review-found:
    the old integer-hash partitioner crashed on strings and object-array
    lexsort crashed on None)."""
    tbl = pa.table({
        "g": pa.array(["x", "x", None, "y", None, "x"]),
        "id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "v": pa.array([5.0, 7.0, 1.0, 9.0, 3.0, 6.0])})
    got = topk_per_group(_ds(tbl, blocks=3), "g", "v", 2, "id") \
        .to_pandas()
    by_g: dict = {}
    for g, i in zip(got["g"], got["id"]):
        by_g.setdefault(g if isinstance(g, str) else None, []).append(int(i))
    assert sorted(by_g["x"]) == [2, 6]      # v=7,6 beat v=5
    assert by_g["y"] == [4]
    assert sorted(by_g[None]) == [3, 5]     # null keys are ONE group


def test_sample_hash_negative_ids_match_sql(ray_session):
    """numpy % is sign-of-divisor, SQL % is sign-of-dividend — the SQL
    predicate must renormalize so negative ids select identically
    (review-found divergence)."""
    ids = np.arange(-5_000, 5_000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    got = sample_hash(_ds(tbl), "doc_id", 1500).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT doc_id FROM t WHERE {sample_hash_sql_pred('doc_id', 1500)}"
    ).df()
    assert sorted(got["doc_id"].tolist()) == sorted(want["doc_id"].tolist())


def test_quantile_exact_duplicate_qs(ray_session):
    """Duplicate requested quantiles each keep their row (review-found
    dict-collapse)."""
    tbl = pa.table({"value": pa.array(np.arange(100, dtype=np.float64))})
    got = quantile_exact(_ds(tbl), "value", [0.5, 0.5, 0.9]).to_pandas()
    assert len(got) == 3
    assert got["q"].tolist() == [0.5, 0.5, 0.9]


def test_topk_per_group_ties_and_small_groups(ray_session):
    # duplicate order values: ties must break by id ASC, deterministically
    tbl = pa.table({
        "g": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "id": pa.array([10, 11, 12, 13, 20], type=pa.int64()),
        "v": pa.array([5.0, 5.0, 5.0, 1.0, 9.0])})
    got = topk_per_group(_ds(tbl, blocks=3), "g", "v", 2, "id") \
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    assert got[got["g"] == 1]["id"].tolist() == [10, 11]  # ids 12,13 lose
    assert got[got["g"] == 2]["id"].tolist() == [20]      # group smaller than k


def test_sample_bottom_k_matches_duckdb(ray_session):
    """Fixed-size deterministic sample: exact row-set parity with the SQL
    ORDER BY hash LIMIT k formulation, including negative ids (numpy %
    vs SQL % sign divergence) and k > n (returns everything)."""
    import duckdb
    import ray.data as rd
    from timezonemap_ray.stages.select import (sample_bottom_k,
                                               sample_bottom_k_sql_order)
    rng = np.random.default_rng(3)
    ids = rng.choice(np.arange(-5_000, 5_000), 2_000, replace=False)
    tbl = pa.table({"id": pa.array(ids, type=pa.int64()),
                    "x": pa.array(rng.uniform(size=2_000))})
    ds = rd.from_arrow(tbl).repartition(7)
    got = sample_bottom_k(ds, "id", 50).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT id, x FROM t ORDER BY "
        f"{sample_bottom_k_sql_order('id')} LIMIT 50").df()
    assert got["id"].tolist() == want["id"].tolist()
    assert got["x"].tolist() == want["x"].tolist()
    # k > n: everything comes back, still deterministic order
    allr = sample_bottom_k(ds, "id", 10_000).to_pandas()
    assert len(allr) == 2_000


def test_sample_per_group_matches_sql(ray_session, sf_dir):
    import duckdb
    import pandas as pd
    import ray.data as rd
    from timezonemap_ray.stages.select import (sample_bottom_k_sql_order,
                                               sample_per_group)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    got = sample_per_group(ds, "source", "doc_id", k=7) \
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    order = sample_bottom_k_sql_order("doc_id")
    sql = con.sql(f"""
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY {order}) <= 7
        ORDER BY source, doc_id""").df()
    pd.testing.assert_frame_equal(got[["doc_id", "source"]], sql)
    # every source contributes exactly min(7, group size) rows
    sizes = con.sql("SELECT source, count(*) AS n FROM documents "
                    "GROUP BY source").df().set_index("source")["n"]
    per = got.groupby("source").size()
    for src, n in sizes.items():
        assert per.get(src, 0) == min(7, n)


def test_winsorize_bounds_and_edges(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.select import quantile_exact, winsorize
    rng = np.random.default_rng(3)
    v = rng.normal(0, 100, 3000).tolist()
    v[5] = None          # null stays null
    v[17] = float("nan")  # NaN passes through
    tbl = pa.table({"event_id": pa.array(range(3000), type=pa.int64()),
                    "value": pa.array(v, type=pa.float64())})
    ds = rd.from_arrow(tbl).repartition(7)
    qt = quantile_exact(ds, "value", [0.05, 0.95])
    lo, hi = qt["value"].to_pylist()
    out = winsorize(ds, "value", 0.05, 0.95).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    w = out["value_w"]
    assert w.isna()[5]          # null in → null out
    assert np.isnan(w[17])      # NaN in → NaN out (not clipped to hi)
    ok = w.dropna()[~np.isnan(w.dropna())]
    assert ok.min() == lo and ok.max() == hi
    inside = out["value"].between(lo, hi)
    assert (out.loc[inside & out["value"].notna(), "value_w"]
            == out.loc[inside & out["value"].notna(), "value"]).all()


def test_mixture_sample_rates_and_determinism(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.corpus import mixture_sample
    n = 20000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
    })
    ds = rd.from_arrow(tbl).repartition(9)
    rates = {"s0": 10000, "s1": 5000, "s2": 500}  # s3 absent → dropped
    out = mixture_sample(ds, "source", "doc_id", rates).to_pandas()
    counts = out.groupby("source").size()
    assert counts.get("s0") == n // 4                      # rate 100%
    assert abs(counts.get("s1") / (n // 4) - 0.5) < 0.05   # ~50%
    assert abs(counts.get("s2") / (n // 4) - 0.05) < 0.02  # ~5%
    assert "s3" not in counts.index
    out2 = mixture_sample(ds, "source", "doc_id", rates).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])  # deterministic


def test_target_selection_int_matches_sql_twin(ray_session):
    """DSIR-shaped count-ratio selection: SQL bit parity at two
    partitionings on a corpus whose target-sampled docs share a
    distinctive vocabulary."""
    from timezonemap_ray.oracle import target_selection_int_sql
    from timezonemap_ray.stages.select import (SAMPLE_MOD, SAMPLE_MULT,
                                               SAMPLE_SPACE,
                                               target_selection_int)
    rate = 2_000  # 20% target sample
    ids = np.arange(60, dtype=np.int64)
    h = ((ids * SAMPLE_MULT) % SAMPLE_MOD) % SAMPLE_SPACE
    is_t = h < rate
    # target docs talk about quasars; raw docs about plumbing; a few
    # NON-target docs also talk about quasars (they should score high)
    texts = []
    for i, t in zip(ids, is_t):
        if t:
            texts.append("quasar jets emit radio lobes quasar")
        elif i % 7 == 0:
            texts.append("quasar survey maps radio quasar")
        elif i % 11 == 0:
            texts.append("")  # empty doc: no tokens, never selected
        else:
            texts.append("pipe wrench fits the drain trap")
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, type=pa.string())})
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(target_selection_int_sql(dim=32, target_rate_bp=rate)
                       + " ORDER BY doc_id").df()
    for parts in (1, 6):
        got = target_selection_int(_ds(tbl, parts), dim=32,
                                   target_rate_bp=rate).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=True)
    kept = set(got["doc_id"])
    # every target doc and every quasar-adjacent doc selected; all
    # plumbing and empty docs rejected
    for i, t in zip(ids, is_t):
        if t or (not t and i % 7 == 0 and i % 11 != 0):
            assert i in kept, i
        elif "pipe" in texts[i] or texts[i] == "":
            assert i not in kept, i


def test_target_selection_int_empty_target(ray_session):
    """rate 0 => empty target sample => all weights 0 => nothing kept
    (engine and SQL agree)."""
    from timezonemap_ray.oracle import target_selection_int_sql
    from timezonemap_ray.stages.select import target_selection_int
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(["a b c", "d e", "f"])})
    got = target_selection_int(_ds(tbl, 1), dim=16,
                               target_rate_bp=0).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(target_selection_int_sql(dim=16, target_rate_bp=0)).df()
    assert len(got) == 0 and len(want) == 0


def test_feature_hash_counts_unsigned_mode():
    """signed=False sums +1 per occurrence: row sums equal token counts
    and every entry is nonnegative; signed mode is unchanged."""
    from timezonemap_ray.stages.text import feature_hash_counts
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["x y x z", ""])})
    u = feature_hash_counts(tbl, dim=8, signed=False)
    m = np.array(u["counts"].to_pylist())
    assert (m >= 0).all()
    assert m.sum(axis=1).tolist() == [4, 0]
    s = feature_hash_counts(tbl, dim=8, signed=True)
    ms = np.array(s["counts"].to_pylist())
    assert (np.abs(ms).sum(axis=1) <= 4).all()


def test_target_selection_int_custom_id_col(ray_session):
    """Regression (review-found): a non-default id column must work —
    feature_hash_counts used to hardcode doc_id and crash."""
    from timezonemap_ray.stages.select import target_selection_int
    tbl = pa.table({"my_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "text": pa.array(["a b", "c d", "a b", "e"])})
    out = target_selection_int(_ds(tbl, 2), dim=16, target_rate_bp=5_000,
                               id_col="my_id").to_pandas()
    assert list(out.columns) == ["my_id", "score"]
    assert set(out["my_id"]) <= {1, 2, 3, 4}
