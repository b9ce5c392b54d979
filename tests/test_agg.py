"""Aggregate-family operators vs DuckDB: keep-latest dedup per key,
integer-exact grouped moments, static pivot, ROLLUP grouping sets, and
text normalization."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from timezonemap_ray.stages.agg import (
    grouped_stats, latest_per_group, pivot_counts, rollup_agg)
from timezonemap_ray.stages.text import normalize_text


def _events_tbl(n=400, with_null_key=True):
    rng = np.random.default_rng(7)
    uid = rng.integers(0, 23, n).astype(np.int64)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(uid, type=pa.int64()),
        "ts": pa.array((rng.integers(0, 10**6, n) * 1000).astype("int64"),
                       type=pa.int64()),
        "etype": pa.array([["click", "view", "buy"][int(i)]
                           for i in rng.integers(0, 3, n)]),
        "value": pa.array(np.round(rng.uniform(-50, 400, n), 2)),
    })
    if with_null_key:
        # a null group key forms its own group (SQL GROUP BY)
        uids = tbl["user_id"].to_pylist()
        uids[5] = None
        uids[17] = None
        tbl = tbl.set_column(1, "user_id", pa.array(uids, type=pa.int64()))
    return tbl


def _ds(tbl, blocks=6):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(blocks)


def _con(tbl, name="t"):
    con = duckdb.connect()
    con.register(name, tbl)
    return con


def test_latest_per_group_matches_duckdb(ray_session):
    tbl = _events_tbl()
    got = latest_per_group(_ds(tbl), "user_id", ["ts", "event_id"],
                           n_parts=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _con(tbl).execute("""
        SELECT * FROM t
        QUALIFY row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY event_id""").df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["user_id"].equals(want["user_id"].astype(got["user_id"].dtype))


def test_grouped_stats_matches_duckdb(ray_session):
    tbl = _events_tbl()
    got = grouped_stats(_ds(tbl), "etype", "value").to_pandas() \
        .sort_values("etype").reset_index(drop=True)
    want = _con(tbl).execute("""
        WITH c AS (SELECT etype, CAST(round(value * 100.0) AS BIGINT) AS v
                   FROM t WHERE NOT isnan(value))
        SELECT etype, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_c,
               CAST(sum(v * v) AS BIGINT) AS sumsq_c
        FROM c GROUP BY etype ORDER BY etype""").df()
    assert got["etype"].tolist() == want["etype"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["sum_c"].tolist() == want["sum_c"].tolist()
    assert got["sumsq_c"].tolist() == want["sumsq_c"].tolist()
    # derived moments agree with pandas on the scaled-int values
    for _, r in got.iterrows():
        mask = [e == r["etype"] for e in tbl["etype"].to_pylist()]
        v = np.round(np.asarray(tbl["value"].to_pylist())[mask] * 100)
        assert np.isclose(r["mean"], v.mean() / 100)
        assert np.isclose(r["std"], v.std() / 100)


def test_grouped_stats_nan_dropped(ray_session):
    tbl = _events_tbl(n=50, with_null_key=False)
    vals = tbl["value"].to_pylist()
    vals[3] = float("nan")
    vals[9] = float("nan")
    tbl = tbl.set_column(4, "value", pa.array(vals))
    got = grouped_stats(_ds(tbl, blocks=3), "etype", "value").to_pandas()
    want = _con(tbl).execute("""
        WITH c AS (SELECT etype, CAST(round(value * 100.0) AS BIGINT) AS v
                   FROM t WHERE NOT isnan(value))
        SELECT etype, count(*) AS n FROM c GROUP BY etype""").df()
    m = dict(zip(want["etype"], want["n"]))
    for _, r in got.iterrows():
        assert r["n"] == m[r["etype"]]


def test_grouped_stats_null_values_dropped(ray_session):
    # null values drop like NaN (SQL: NOT isnan(NULL) is NULL → filtered);
    # a null int64 → NaN in to_numpy would otherwise poison the sums
    tbl = pa.table({"g": pa.array(["a", "a", "b", "b", "b"]),
                    "value": pa.array([1.0, None, 2.0, None, 3.5])})
    got = grouped_stats(_ds(tbl, blocks=2), "g", "value").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert got["n"].tolist() == [1, 2]
    assert got["sum_c"].tolist() == [100, 550]
    assert got["sumsq_c"].tolist() == [100 * 100, 200 * 200 + 350 * 350]


def test_grouped_stats_overflow_fallback_exact(ray_session):
    # values big enough that a float64 bincount would lose integer
    # exactness — forces the int64 reduceat path
    n = 2000
    rng = np.random.default_rng(3)
    big = rng.integers(10**11, 10**12, n).astype(np.float64) / 100.0
    tbl = pa.table({"g": pa.array(["a"] * (n // 2) + ["b"] * (n // 2)),
                    "value": pa.array(big)})
    got = grouped_stats(_ds(tbl, blocks=2), "g", "value").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    cents = np.round(big * 100).astype(np.int64)
    for i, g in enumerate(["a", "b"]):
        sel = cents[: n // 2] if g == "a" else cents[n // 2:]
        assert got["sum_c"][i] == int(sel.sum())
        assert got["sumsq_c"][i] == int((sel * sel).sum())


def test_pivot_counts_matches_duckdb(ray_session):
    tbl = _events_tbl()
    cats = ["buy", "click", "view"]
    got = pivot_counts(_ds(tbl), "user_id", "etype", cats).to_pandas() \
        .sort_values("user_id", na_position="last").reset_index(drop=True)
    want = _con(tbl).execute("""
        SELECT user_id,
               CAST(sum(CASE WHEN etype = 'buy' THEN 1 ELSE 0 END) AS BIGINT) AS buy,
               CAST(sum(CASE WHEN etype = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN etype = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM t GROUP BY user_id ORDER BY user_id NULLS LAST""").df()
    assert len(got) == len(want)
    for c in cats:
        assert got[c].tolist() == want[c].tolist()


def test_pivot_ignores_unlisted_categories(ray_session):
    tbl = _events_tbl(n=60, with_null_key=False)
    got = pivot_counts(_ds(tbl, blocks=3), "user_id", "etype",
                       ["click"]).to_pandas()
    want = _con(tbl).execute("""
        SELECT user_id, count(*) AS n FROM t WHERE etype = 'click'
        GROUP BY user_id""").df()
    m = dict(zip(want["user_id"], want["n"]))
    for _, r in got.iterrows():
        assert r["click"] == m.get(r["user_id"], 0)


def test_rollup_agg_matches_duckdb(ray_session):
    tbl = _events_tbl(with_null_key=False)
    got = rollup_agg(_ds(tbl), ["etype", "user_id"],
                     value_col="value").to_pandas()
    want = _con(tbl).execute("""
        WITH c AS (SELECT etype, user_id,
                          CAST(round(value * 100.0) AS BIGINT) AS cents
                   FROM t)
        SELECT etype, user_id, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS total_c
        FROM c GROUP BY ROLLUP(etype, user_id)""").df()

    def norm(df):
        df = df[["etype", "user_id", "n", "total_c"]].copy()
        df["user_id"] = df["user_id"].astype("float64")
        return df.sort_values(["etype", "user_id", "n"],
                              na_position="last").reset_index(drop=True)

    g, w = norm(got), norm(want)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_normalize_text_matches_duckdb(ray_session):
    texts = ["  Hello   WORLD ", "a\t\tB\nc", "", "   ", "MiXeD case",
             "tabs\tand\nnewlines\r\nhere  "]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    got = _ds(tbl, blocks=2).map_batches(
        normalize_text, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _con(tbl).execute(r"""
        SELECT doc_id,
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_text
        FROM t ORDER BY doc_id""").df()
    assert got["norm_text"].tolist() == want["norm_text"].tolist()


def test_grouped_ohlc_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import pandas as pd
    import ray.data as rd
    from timezonemap_ray.stages.agg import grouped_ohlc
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    got = grouped_ohlc(ds.repartition(8), "user_id", "ts", "event_id",
                       "value") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    sql = con.sql("""
        WITH ranked AS (
          SELECT user_id, value, 
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn_a,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events),
        agg AS (SELECT user_id, max(value) AS high, min(value) AS low,
                       count(*)::BIGINT AS n
                FROM events GROUP BY user_id)
        SELECT a.user_id, o.value AS open, a.high, a.low,
               c.value AS close, a.n
        FROM agg a
        JOIN ranked o ON o.user_id = a.user_id AND o.rn_a = 1
        JOIN ranked c ON c.user_id = a.user_id AND c.rn_d = 1
        ORDER BY a.user_id""").df()
    cols = ["user_id", "open", "high", "low", "close", "n"]
    pd.testing.assert_frame_equal(got[cols], sql[cols])


def test_grouped_ohlc_single_and_tie(ray_session):
    import ray.data as rd
    from timezonemap_ray.stages.agg import grouped_ohlc
    # one group with a ts tie (id breaks it), one singleton group
    t = pa.table({
        "g": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([100, 100, 200, 50], type=pa.timestamp("us")),
        "id": pa.array([7, 3, 9, 1], type=pa.int64()),
        "v": pa.array([10.0, 20.0, 5.0, 42.0])})
    out = grouped_ohlc(rd.from_arrow(t).repartition(3), "g", "ts", "id",
                       "v").to_pandas().sort_values("g") \
        .reset_index(drop=True)
    # open for g=1: ts=100 tie → id=3 wins → 20.0; close: ts=200 → 5.0
    assert out.loc[0, ["open", "high", "low", "close", "n"]].tolist() == \
        [20.0, 20.0, 5.0, 5.0, 3]
    assert out.loc[1, ["open", "high", "low", "close", "n"]].tolist() == \
        [42.0, 42.0, 42.0, 42.0, 1]


def test_grouped_ohlc_drops_null_values(ray_session):
    import ray.data as rd
    from timezonemap_ray.stages.agg import grouped_ohlc
    t = pa.table({
        "g": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([5.0, None, 1.0])})
    out = grouped_ohlc(rd.from_arrow(t), "g", "ts", "id", "v").to_pandas()
    row = out.iloc[0]
    assert [row["open"], row["high"], row["low"], row["close"],
            row["n"]] == [5.0, 5.0, 1.0, 1.0, 2]


def test_zscore_by_group_bit_exact_vs_duckdb(ray_session):
    from timezonemap_ray.stages.agg import zscore_by_group
    rng = np.random.default_rng(23)
    n = 400
    vals = np.round(rng.uniform(-50, 400, n), 2)
    vals[7] = np.nan                      # NaN value → NULL zscore
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "event_type": pa.array([f"t{i % 5}" for i in range(n)]),
        "value": pa.array(vals),
    })
    # null value and a zero-variance singleton group
    v = tbl["value"].to_pylist(); v[11] = None
    tbl = tbl.set_column(2, "value", pa.array(v, type=pa.float64()))
    et = tbl["event_type"].to_pylist(); et[3] = "solo"
    tbl = tbl.set_column(1, "event_type", pa.array(et))

    got = zscore_by_group(_ds(tbl), "event_type", "value") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    want = _con(tbl, "events").execute("""
        WITH c AS (SELECT event_type,
                          CAST(round(value * 100.0) AS BIGINT) AS v
                   FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             s AS (SELECT event_type, count(*)::DOUBLE AS n,
                          CAST(sum(v) AS BIGINT)::DOUBLE AS sum_c,
                          CAST(sum(v * v) AS BIGINT)::DOUBLE AS sumsq_c
                   FROM c GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value,
               CASE WHEN e.value IS NULL OR isnan(e.value) THEN NULL
                    ELSE (CAST(round(e.value * 100.0) AS BIGINT)::DOUBLE
                              * s.n - s.sum_c)
                         / NULLIF(sqrt(GREATEST(
                               s.n * s.sumsq_c - s.sum_c * s.sum_c, 0.0)),
                               0.0)
               END AS zscore
        FROM events e LEFT JOIN s USING (event_type)
        ORDER BY event_id""").df()
    # bit-exact float compare (the reproducibility contract)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert pd.isna(got.loc[7, "zscore"])      # NaN input
    assert pd.isna(got.loc[11, "zscore"])     # null input
    assert pd.isna(got.loc[3, "zscore"])      # singleton group (σ = 0)
    # z-scores are standardized: per-group mean ≈ 0, σ ≈ 1
    g = got.dropna(subset=["zscore"]).groupby("event_type")["zscore"]
    assert (g.mean().abs() < 1e-9).all()
    assert ((g.std(ddof=0) - 1).abs() < 1e-9).all()


def test_events_rolling_group_boundary(ray_session, tmp_path):
    """Rolling window must reset at user boundaries and clamp at group
    starts (roll_n < window on the first rows of each user)."""
    import pyarrow.parquet as pq
    from timezonemap_ray.pipelines.relational import events_rolling
    n = 40
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array((np.arange(n) % 3).astype(np.int64)),
        "ts": pa.array(np.arange(n).astype("datetime64[us]")),
        "value": pa.array(np.full(n, 1.0)),
        "event_type": pa.array(["x"] * n),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = events_rolling(str(tmp_path), window=4).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _con(tbl, "events").execute("""
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(round(value * 100.0) AS BIGINT) AS value_c
                   FROM events)
        SELECT event_id, user_id,
               CAST(sum(value_c) OVER w AS BIGINT) AS roll_sum_c,
               CAST(count(*) OVER w AS BIGINT) AS roll_n,
               (CAST(sum(value_c) OVER w AS BIGINT)::DOUBLE
                / CAST(count(*) OVER w AS BIGINT)::DOUBLE) AS roll_mean_c
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").df()
    pd.testing.assert_frame_equal(got, want, check_exact=True,
                                  check_dtype=False)
    # first row of each user: window clamped to 1
    firsts = got.groupby("user_id").head(1)
    assert (firsts["roll_n"] == 1).all()
    # value=1.0 everywhere → rolling sum = 100·roll_n
    assert (got["roll_sum_c"] == 100 * got["roll_n"]).all()


def test_cube_agg_matches_duckdb(ray_session):
    from timezonemap_ray.stages.agg import cube_agg
    rng = np.random.default_rng(31)
    n = 500
    tbl = pa.table({
        "a": pa.array([f"a{i % 3}" for i in range(n)]),
        "b": pa.array([f"b{i % 4}" for i in range(n)]),
        "v": pa.array(np.round(rng.uniform(-20, 90, n), 2)),
    })
    got = cube_agg(_ds(tbl), ["a", "b"], value_col="v").to_pandas()
    want = _con(tbl).execute("""
        WITH c AS (SELECT a, b, CAST(round(v * 100.0) AS BIGINT) AS cents
                   FROM t)
        SELECT a, b, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_c
        FROM c GROUP BY CUBE(a, b)""").df()
    key = ["a", "b", "n", "total_c"]
    a_ = got[key].sort_values(key).reset_index(drop=True)
    b_ = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a_, b_, check_dtype=False)
    # lattice shape: 12 finest + 3 (a) + 4 (b) + 1 total
    assert len(got) == 20


def test_zscore_join_fallback_equals_broadcast(ray_session, monkeypatch):
    """Forcing the high-cardinality hash-join path must give the exact
    same output as the broadcast path."""
    import timezonemap_ray.stages.agg as agg
    rng = np.random.default_rng(41)
    n = 300
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "event_type": pa.array([f"t{i % 6}" for i in range(n)]),
        "value": pa.array(np.round(rng.uniform(-5, 50, n), 2)),
    })
    ds = _ds(tbl)
    broad = agg.zscore_by_group(ds, "event_type", "value").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    monkeypatch.setattr(agg, "BROADCAST_STATS_MAX", 0)
    joined = agg.zscore_by_group(ds, "event_type", "value").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        broad, joined[broad.columns.tolist()], check_exact=True)


def test_grouped_stats_null_string_group_key(ray_session):
    """Null STRING group keys crashed Ray's sort-based groupby (TypeError
    None < str) — the merge now runs inside hash partitions of the key
    (review-found). Null forms its own group, like SQL GROUP BY."""
    tbl = pa.table({
        "g": pa.array(["a", None, "a", None, "b", "a"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 7.0]),
    })
    got = grouped_stats(_ds(tbl, blocks=3), "g", "value").to_pandas()
    got = got.sort_values("g", na_position="last").reset_index(drop=True)
    con = _con(tbl)
    want = con.execute("""
        SELECT g, count(*) AS n,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS sum_c
        FROM t GROUP BY g ORDER BY g NULLS LAST""").df()
    assert got["g"].where(got["g"].notna(), None).tolist() \
        == want["g"].where(want["g"].notna(), None).tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["sum_c"].tolist() == want["sum_c"].tolist()


def test_pivot_counts_null_string_key(ray_session):
    """Same null-string-key hazard for pivot_counts (review-found)."""
    tbl = pa.table({
        "url": pa.array(["u1", None, "u1", None, "u2"]),
        "etype": pa.array(["click", "view", "view", "click", "click"]),
    })
    got = pivot_counts(_ds(tbl, blocks=2), "url", "etype",
                       ["click", "view"]).to_pandas() \
        .sort_values("url", na_position="last").reset_index(drop=True)
    assert got["url"].where(got["url"].notna(), None).tolist() \
        == ["u1", "u2", None]
    assert got["click"].tolist() == [1, 1, 1]
    assert got["view"].tolist() == [1, 0, 1]


def test_zscore_null_group_same_on_both_plans(ray_session, monkeypatch):
    """The broadcast path's pc.index_in matches null group keys to the
    null-group stats row; the hash-join path dropped them to NULL —
    plan-divergent semantics (review-found). Both plans now normalize
    null-group rows against the null group's own stats."""
    import timezonemap_ray.stages.agg as agg_mod
    from timezonemap_ray.stages.agg import zscore_by_group
    tbl = pa.table({
        "g": pa.array(["a", "a", None, None, None, "b", "b"]),
        "value": pa.array([1.0, 3.0, 10.0, 20.0, 40.0, 5.0, 9.0]),
    })
    a = zscore_by_group(_ds(tbl, blocks=3), "g", "value").to_pandas() \
        .sort_values(["value"]).reset_index(drop=True)
    monkeypatch.setattr(agg_mod, "BROADCAST_STATS_MAX", 0)
    b = zscore_by_group(_ds(tbl, blocks=3), "g", "value").to_pandas() \
        .sort_values(["value"]).reset_index(drop=True)
    assert np.allclose(a["zscore"].to_numpy(), b["zscore"].to_numpy(),
                       equal_nan=True)
    # and the null-group rows really are normalized (not NULL)
    an = a[a["g"].isna()]["zscore"]
    assert an.notna().all()


def test_grouped_ohlc_string_group_schema(ray_session):
    """The empty-batch fold branch hardcoded int64/timestamp[us] types,
    emitting schema-divergent empty blocks for string groups
    (review-found) — now derived from the input."""
    from timezonemap_ray.stages.agg import grouped_ohlc
    tbl = pa.table({
        "sym": pa.array(["x", "y", "x", None]),
        "ts": pa.array([3, 1, 2, 9], type=pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, None]),
    })
    got = grouped_ohlc(_ds(tbl, blocks=4), "sym", "ts", "event_id",
                       "value").to_pandas() \
        .sort_values("sym").reset_index(drop=True)
    assert got["sym"].tolist() == ["x", "y"]
    assert got["open"].tolist() == [3.0, 2.0]   # x: ts 2 first
    assert got["close"].tolist() == [1.0, 2.0]  # x: ts 3 last
    assert got["n"].tolist() == [2, 1]
