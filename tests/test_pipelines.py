"""Ray-level pipeline E2E: span extraction invariant, flagship join,
broadcast ≡ shuffled ≡ brute-force oracle, boundary-distance stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timezonemap_ray import worlds
from timezonemap_ray.api import TimeZoneEngine
from timezonemap_ray.index import build_index, lookup_linear_scan
from timezonemap_ray.pipelines import flagship as fs
from timezonemap_ray.sources import docgen
from timezonemap_ray.stages.spans import explode_spans, extract_geo_points


@pytest.fixture(scope="module")
def engine(ray_session):
    return TimeZoneEngine(build_index(worlds.conformance_table()))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    if "zone_id" in df.columns:
        df = df.assign(zone_id=df["zone_id"].astype("object"))
    return df.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)


def test_span_sequence_invariant(ray_session, sf_dir):
    """Per-row invariant (BASELINE.json input_hint): exploded spans keep
    (kind, text, media_ref, order) exactly; geo parse only appends."""
    ds = docgen.span_documents(sf_dir)
    docs = ds.take_all()
    exploded = ds.map_batches(explode_spans, batch_format="pyarrow").take_all()
    by_doc = {}
    for row in exploded:
        by_doc.setdefault(row["doc_id"], []).append(row)
    assert len(by_doc) == len(docs)
    for doc in docs:
        rows = sorted(by_doc[doc["doc_id"]], key=lambda r: r["span_idx"])
        got = [(r["kind"], r["text"], r["media_ref"]) for r in rows]
        exp = [(s["kind"], s["text"], s["media_ref"]) for s in doc["spans"]]
        assert got == exp
        assert [r["span_idx"] for r in rows] == list(range(len(exp)))


def test_geo_parse_round_trip(ray_session, sf_dir):
    """Parsed lat/lng equals the generator's float64 values bit-for-bit
    (repr round-trip)."""
    pts = fs.geo_points(sf_dir).take_all()
    for row in pts[:200]:
        doc_id = np.int64(int(row["doc_id"]))
        j = row["span_idx"] - 1  # geo spans start at span_idx 1
        lat, lng = docgen.geo_points_for(np.array([doc_id]), int(j))
        assert row["lat"] == lat[0] and row["lng"] == lng[0]


def test_flagship_matches_oracle(ray_session, sf_dir, engine):
    """Broadcast-join output ≡ brute-force linear-scan oracle (the
    reference's Q3/Q4 semantics) for every geo span in the corpus."""
    out = fs.flagship(sf_dir, engine).to_pandas()
    lats, lngs = out["lat"].to_numpy(), out["lng"].to_numpy()
    oracle = lookup_linear_scan(engine.index, lats, lngs)
    assert out["zone_id"].where(out["zone_id"].notna(), None).tolist() == \
        oracle["zone_id"].tolist()
    assert out["matched"].tolist() == oracle["matched"].tolist()
    assert out["matched"].all()  # conformance world covers the whole planet


def test_shuffled_equals_broadcast(ray_session, sf_dir, engine):
    pts = fs.geo_points(sf_dir)
    a = engine.lookup_points(pts).to_pandas()
    b = engine.lookup_points_shuffled(pts, salt_threshold=50).to_pandas()
    cols = ["doc_id", "span_idx", "lat", "lng", "zone_id", "matched"]
    a = _sorted(a)[cols]
    b = _sorted(b)[cols]
    pd.testing.assert_frame_equal(a, b)


def test_want_all_order(ray_session, engine):
    """all_zones is smallest-area-first (Q5); disputed point returns both."""
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"lat": [42.534980], "lng": [87.615030]}))
    out = engine.lookup_points(ds, want_all=True).take_all()
    assert out[0]["all_zones"][:2] == ["Test/Urumqi", "Test/Shanghai"]
    assert out[0]["zone_id"] == "Test/Urumqi"


def test_boundary_distance_stage(ray_session):
    import ray.data as rd
    from timezonemap_ray.zonetable import zones_to_table
    eng = TimeZoneEngine(build_index(
        zones_to_table([worlds.square_with_island_zone()]), cell_size=1.0))
    f32 = lambda v: float(np.float32(v))
    ds = rd.from_arrow(pa.table({
        "lat": [f32(1.5), f32(1.65), 10.0],
        "lng": [f32(1.999), f32(1.25), 10.0]}))
    joined = eng.lookup_points(ds)
    out = eng.boundary_distance(joined).to_pandas().sort_values("lat")
    vals = out["distance_m"].tolist()
    assert vals[0] == pytest.approx(111.286, abs=0.001)
    assert vals[1] == pytest.approx(5563.676, abs=0.001)
    assert np.isnan(vals[2])  # unmatched point → NaN, never throws


def test_malformed_geo_spans_never_throw(ray_session, engine):
    """Engine rule: bad rows get flagged, never raise (100 TB robustness)."""
    import ray.data as rd
    from timezonemap_ray.stages.spans import parse_geo_spans
    t = pa.table({
        "doc_id": ["a", "a", "b", "b"],
        "span_idx": pa.array([0, 1, 0, 1], type=pa.int32()),
        "kind": ["geo", "geo", "geo", "geo"],
        "text": ["39.5,-7.6", "not,a,point", "", "1000garbage"],
        "media_ref": [""] * 4,
        "offset": pa.array([0, 1, 0, 1], type=pa.int32()),
    })
    parsed = parse_geo_spans(t)
    assert parsed["parse_error"].to_pylist() == [False, True, True, True]
    joined = engine.lookup_points(rd.from_arrow(parsed)).to_pandas()
    ok = joined[~joined["parse_error"]]
    bad = joined[joined["parse_error"]]
    assert ok["zone_id"].astype(str).tolist() == ["Test/West"]
    assert bad["zone_id"].isna().all()
    assert (bad["error"] == "outside_initialized_region").all()


def test_shuffled_want_all_fallback(ray_session, sf_dir, engine):
    """Shuffled path parity also with want_all + fallback flags on."""
    pts = fs.geo_points(sf_dir)
    a = engine.lookup_points(pts, want_all=True, fallback=True).to_pandas()
    b = engine.lookup_points_shuffled(pts, want_all=True, fallback=True,
                                      salt_threshold=50).to_pandas()
    a = _sorted(a)
    b = _sorted(b)
    assert a["zone_id"].astype("object").tolist() == \
        b["zone_id"].astype("object").tolist()
    assert a["all_zones"].map(list).tolist() == b["all_zones"].map(list).tolist()
    assert a["fallback"].tolist() == b["fallback"].tolist()


def test_actor_pool_path_equals_task_path(ray_session, sf_dir, engine):
    """compute='actors' (classic stateful pool) == compute='tasks' output."""
    pts = fs.geo_points(sf_dir)
    a = engine.lookup_points(pts, compute="tasks").to_pandas()
    b = engine.lookup_points(pts, compute="actors", concurrency=(1, 2)).to_pandas()
    cols = ["doc_id", "span_idx", "zone_id", "matched"]
    a = _sorted(a)[cols]
    b = _sorted(b)[cols]
    pd.testing.assert_frame_equal(a, b)


def test_reader_seam(ray_session, sf_dir, tmp_path_factory):
    from timezonemap_ray.sources.reader import lance_available, read_table
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = ds.count()
    assert n > 0
    # csv / jsonl dispatch
    import pandas as pd
    tmp = tmp_path_factory.mktemp("reader")
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang"]]
    pdf.to_csv(tmp / "docs.csv", index=False)
    pdf.to_json(tmp / "docs.jsonl", orient="records", lines=True)
    assert read_table(str(tmp / "docs.csv"), columns=["doc_id"]).count() == n
    assert read_table(str(tmp / "docs.jsonl"), columns=["doc_id"]).count() == n
    if not lance_available():
        import pytest as _pytest
        with _pytest.raises(NotImplementedError, match="[Ll]ance"):
            read_table("/tmp/nonexistent.lance")


def test_shuffled_with_precomputed_salts(ray_session, sf_dir, engine):
    """salt_counts priors skip the histogram pre-pass; output unchanged."""
    from timezonemap_ray.pipelines.flagship import shuffled_join
    pts = fs.geo_points(sf_dir)
    a = engine.lookup_points(pts).to_pandas()
    b = shuffled_join(pts, engine, salt_counts={1234: 4}).to_pandas()
    cols = ["doc_id", "span_idx", "zone_id", "matched"]
    pd.testing.assert_frame_equal(_sorted(a)[cols], _sorted(b)[cols])


def test_profile_documents_with_dups(ray_session, tmp_path):
    """Profile card on a corpus WITH duplicates: exact dup count and
    quantiles must match DuckDB."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from timezonemap_ray.pipelines.profile import profile_documents
    rng = np.random.default_rng(9)
    texts = [f"doc body {i % 40}" for i in range(200)]   # 40 distinct
    tbl = pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "text": pa.array(texts),
        "source": pa.array([f"s{i % 7}" for i in range(200)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = profile_documents(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute("""
        SELECT count(*)::BIGINT AS n_rows,
               count(DISTINCT source)::BIGINT AS n_sources,
               sum(n_chars)::BIGINT AS sum_chars,
               max(n_chars)::BIGINT AS max_chars,
               CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
               CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95_chars,
               (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_dup_texts
        FROM documents""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_dup_texts"][0] == 160


def test_audit_referential_detects_orphans(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from timezonemap_ray.pipelines.profile import audit_referential
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 99, 98], type=pa.int64())}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([10, 11, 77], type=pa.int64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], type=pa.int64()),
        "c_nationkey": pa.array([0, 5], type=pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], type=pa.int64())}),
        tmp_path / "nation.parquet")
    got = audit_referential(str(tmp_path)).to_pandas().iloc[0]
    assert got["orphan_lineitems"] == 2   # 99, 98
    assert got["orphan_orders"] == 1      # custkey 77
    assert got["orphan_customers"] == 1   # nationkey 5


def test_event_transitions_matches_duckdb(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from timezonemap_ray.pipelines.relational import event_transitions
    rng = np.random.default_rng(17)
    n = 600
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**6, n).astype("datetime64[us]")),
        "event_type": pa.array([f"t{int(x)}" for x in
                                rng.integers(0, 5, n)]),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = event_transitions(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute("""
        WITH s AS (SELECT user_id, event_type,
                          lag(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT prev AS from_type, event_type AS to_type,
               count(*)::BIGINT AS n
        FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type""").df()
    key = ["from_type", "to_type"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # conservation: total transitions = rows - distinct users
    assert got["n"].sum() == n - tbl["user_id"].to_pandas().nunique()


def test_shuffled_join_empty_lazy_input(ray_session):
    """Regression (r4 review): a LAZY zero-row input through the staging
    branch must yield an empty result, not a read-back crash."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timezonemap_ray import worlds
    from timezonemap_ray.api import TimeZoneEngine
    from timezonemap_ray.pipelines.flagship import shuffled_join
    eng = TimeZoneEngine.for_everywhere(worlds.conformance_table())
    empty = rd.from_arrow(pa.table({
        "lat": pa.array([], type=pa.float64()),
        "lng": pa.array([], type=pa.float64())}))
    lazy = empty.map_batches(lambda b: b, batch_format="pyarrow")
    assert shuffled_join(lazy, eng).count() == 0


def test_salt_fanout_capped_at_key_stride():
    """VERDICT r4 #6: a cell hotter than threshold*max_salt asks for more
    fan-out than the per-cell key stride holds; the salt must clamp at
    max_salt so keys never spill into the next cell's key space."""
    from timezonemap_ray import cells

    rng = np.random.default_rng(11)
    n = 20_000
    cell = np.full(n, 777, dtype=np.int64)
    # a benign neighbor at the very next id — its keys must stay disjoint
    cell[-100:] = 778
    rh = rng.integers(0, 2**62, size=n)
    max_salt = 64
    # request 4M-way fan-out on the hot cell (way past the stride)
    keys = cells.salted_keys(cell, {777: 4_000_000}, rh, max_salt=max_salt)
    hot = keys[cell == 777]
    assert hot.min() >= 777 * max_salt
    assert hot.max() < 778 * max_salt          # never bleeds into cell 778
    assert len(np.unique(hot)) == max_salt     # full capped fan-out used
    cold = keys[cell == 778]
    assert (cold == 778 * max_salt).all()      # unsalted neighbor intact
    # group sizes stay balanced under the cap (no salt value starved)
    _, counts = np.unique(hot, return_counts=True)
    assert counts.min() > 0.5 * counts.mean()


def test_shuffled_join_forced_cap_matches_broadcast(ray_session, sf_dir,
                                                    engine):
    """End-to-end: a tiny max_salt with an over-asking salt_counts prior
    still produces exactly the broadcast join's rows."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "lat": rng.uniform(-60, 60, 3000),
        "lng": rng.uniform(-180, 180, 3000),
    })
    # 90% of rows in one cell -> that cell's count asks for huge fan-out
    df.loc[: int(0.9 * len(df)), ["lat", "lng"]] = [10.01, 10.01]
    ds = rd.from_pandas(df).materialize()
    # priors demanding 10^6-way salt on every cell the data occupies
    from timezonemap_ray import cells as C
    cids = C.cell_ids(df["lat"].to_numpy(), df["lng"].to_numpy(),
                      engine.index.cell_size)
    priors = {int(c): 1_000_000 for c in np.unique(cids)}
    a = fs.shuffled_join(ds, engine, salt_counts=priors).to_pandas()
    a = a.drop(columns=[c for c in ("cell_id", "shuffle_key")
                        if c in a.columns])
    b = engine.lookup_points(ds).to_pandas()
    key = ["lat", "lng"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_like=True)
