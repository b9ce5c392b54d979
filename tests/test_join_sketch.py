"""range_join + asof_join units and HLL sketch accuracy."""

import numpy as np
import pyarrow as pa
import pytest

from timezonemap_ray.stages import sketch
from timezonemap_ray.stages.join import asof_join, range_join


def test_range_join(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"v": [0.5, 1.0, 4.9, 5.0, 99.0, -1.0]}))
    out = range_join(ds, lows=[0, 1, 5], highs=[1, 5, 100],
                     labels=["low", "mid", "high"], value_col="v").to_pandas()
    got = out.sort_values("v")["bucket"].astype("object") \
        .where(out.sort_values("v")["bucket"].notna(), None).tolist()
    assert got == [None, "low", "mid", "mid", "high", "high"]


def test_range_join_rejects_overlap(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"v": [1.0]}))
    with pytest.raises(ValueError, match="non-overlapping"):
        range_join(ds, [0, 1], [2, 3], ["a", "b"], "v")


def test_asof_join_semantics(ray_session):
    import pandas as pd
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 3],
        "t": [5.0, 10.0, 2.0, 7.0, 1.0],
    }))
    right = rd.from_arrow(pa.table({
        "rk": [1, 1, 2],
        "rt": [3.0, 10.0, 7.0],
        "val": ["a", "b", "c"],
    }))
    out = asof_join(left, right, key="k", right_key="rk", on="t",
                    right_on="rt", value_cols=["val"]).to_pandas()
    import pandas as pd
    got = {(r.k, r.t): (None if pd.isna(r.val) else r.val)
           for r in out.itertuples()}
    assert got[(1, 2.0)] is None        # nothing at or before t=2
    assert got[(1, 5.0)] == "a"         # rt=3 latest <= 5
    assert got[(1, 10.0)] == "b"        # exact match inclusive
    assert got[(2, 7.0)] == "c"
    assert got[(3, 1.0)] is None        # key with no right rows


def test_asof_join_time_salted_hot_key(ray_session):
    """De-skew plan (VERDICT r4 #5): ONE key whose history spans many
    blocks and the whole time range must produce bit-identical matches
    under time_salt=8 — the carry-in boundary pass supplies the last
    preceding right row across every bucket edge (unique times, so the
    result is fully deterministic)."""
    import ray.data as rd
    rng = np.random.default_rng(7)
    n_l, n_r = 4_000, 1_000
    # one hot key (0) plus a few cold ones; times unique per side
    lk = np.where(rng.random(n_l) < 0.9, 0, rng.integers(1, 5, n_l))
    lt = rng.permutation(n_l * 3)[:n_l].astype(np.int64)
    rk = np.where(rng.random(n_r) < 0.9, 0, rng.integers(1, 5, n_r))
    rt = (rng.permutation(n_r * 3)[:n_r] * 3 + 1).astype(np.int64)
    rv = np.arange(n_r, dtype=np.int64)
    left = rd.from_arrow(pa.table({"k": lk, "t": lt})).repartition(16)
    right = rd.from_arrow(
        pa.table({"rk": rk, "rt": rt, "val": rv})).repartition(16)

    def run(**kw):
        df = asof_join(left, right, key="k", right_key="rk", on="t",
                       right_on="rt", value_cols=["val"], **kw).to_pandas()
        return df.sort_values(["k", "t"]).reset_index(drop=True)

    base = run()
    for salt in (2, 8):
        got = run(time_salt=salt)
        assert got.equals(base), f"time_salt={salt} diverged"
    # explicit bounds skip the min/max pass and must not change results
    got = run(time_salt=8, time_bounds=(int(min(lt.min(), rt.min())),
                                        int(max(lt.max(), rt.max()))))
    assert got.equals(base)
    # pandas reference on the hot key
    import pandas as pd
    lpd = pd.DataFrame({"k": lk, "t": lt}).sort_values("t")
    rpd = pd.DataFrame({"rk": rk, "rt": rt, "val": rv}).sort_values("rt")
    ref = pd.merge_asof(lpd, rpd, left_on="t", right_on="rt",
                        left_by="k", right_by="rk") \
        .sort_values(["k", "t"]).reset_index(drop=True)
    got_vals = [None if pd.isna(v) else int(v) for v in base["val"]]
    ref_vals = [None if pd.isna(v) else int(v) for v in ref["val"]]
    assert got_vals == ref_vals


def test_broadcast_semi_anti_join(ray_session):
    """Semi keeps exactly the in-set keys, anti the complement; null fact
    keys are dropped by semi and kept by anti; semi + anti partition the
    non-null rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.join import broadcast_semi_join
    tbl = pa.table({
        "k": pa.array([1, 2, 3, None, 5, 2, 7], type=pa.int64()),
        "x": pa.array(list(range(7)), type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(3)
    keys = [2, 5, 99]
    semi = broadcast_semi_join(ds, keys, "k").to_pandas()
    anti = broadcast_semi_join(ds, keys, "k", anti=True).to_pandas()
    assert sorted(semi["x"].tolist()) == [1, 4, 5]        # k in {2,5}
    assert sorted(anti["x"].tolist()) == [0, 2, 3, 6]     # incl. null row
    assert len(semi) + len(anti) == tbl.num_rows


def test_hll_accuracy(ray_session):
    import ray.data as rd
    n = 200_000
    # 50k distinct values, each appearing 4x
    vals = np.tile(np.arange(50_000, dtype=np.int64), 4)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = sketch.approx_distinct(ds, "v", p=12)
    assert est == pytest.approx(50_000, rel=0.05)


def test_hll_merge_equals_single():
    vals = np.arange(10_000, dtype=np.int64)
    whole = sketch.hll_register_block(vals)
    merged = np.maximum(sketch.hll_register_block(vals[:5000]),
                        sketch.hll_register_block(vals[5000:]))
    assert np.array_equal(whole, merged)  # sketches are mergeable


def test_hll_estimate_exact_matches_float_both_branches():
    """The order-independent estimator (SQL-twin arithmetic) agrees with
    the float reference estimator to relative float noise on BOTH the
    small-range (ln) branch and the raw harmonic branch."""
    small = sketch.hll_register_block(np.arange(100, dtype=np.int64))
    big = sketch.hll_register_block(np.arange(200_000, dtype=np.int64))
    for regs in (small, big):
        exact, zeros = sketch.hll_estimate_exact(regs)
        assert exact == pytest.approx(sketch.hll_estimate(regs), rel=1e-12)
        assert zeros == int((regs == 0).sum())
    # big world takes the raw branch (few zero registers)
    assert (big == 0).sum() < 0.1 * big.size


def test_hll_estimate_sql_bit_parity_both_branches(tmp_path):
    """DuckDB's hll_estimate_sql reproduces hll_estimate_exact's float64
    bits on both estimator branches."""
    import struct

    import duckdb
    for n, name in ((150, "small"), (300_000, "big")):
        keys = np.arange(n, dtype=np.int64)
        regs = sketch.hll_register_block(keys, p=12)
        est, _ = sketch.hll_estimate_exact(regs)
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT unnest(range(%d)) AS k" % n)
        got = con.execute(sketch.hll_estimate_sql("t", "k", p=12)).fetchone()[0]
        assert struct.pack("d", est) == struct.pack("d", got), name


def test_bloom_semi_join_exact_modes(ray_session):
    """bloom_semi_join: exact result (all three modes agree with the naive
    IN-set answer) on int keys with nulls on both sides; prefilter alone
    has NO false negatives."""
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_semi_join
    rng = np.random.default_rng(5)
    fact_keys = rng.integers(0, 100_000, 20_000)
    fact = pa.table({
        "k": pa.array([None if i % 97 == 0 else int(v)
                       for i, v in enumerate(fact_keys)], type=pa.int64()),
        "payload": pa.array(np.arange(20_000))})
    member = rng.choice(100_000, 3_000, replace=False)
    keys = pa.table({"kk": pa.array(
        [None] + [int(v) for v in member], type=pa.int64())})
    in_set = set(int(v) for v in member)
    want = sorted(int(p) for kv, p in zip(fact["k"].to_pylist(),
                                          fact["payload"].to_pylist())
                  if kv is not None and kv in in_set)
    fact_ds = rd.from_arrow(fact).repartition(6)
    keys_ds = rd.from_arrow(keys).repartition(4)
    for mode in ("shuffle", "broadcast"):
        out = bloom_semi_join(fact_ds, keys_ds, "k", keys_col="kk",
                              exact=mode).to_pandas()
        assert sorted(out["payload"].tolist()) == want, mode
    # prefilter only: superset of the true members (no false negatives),
    # with few false positives at 8 bits/key
    pre = bloom_semi_join(fact_ds, keys_ds, "k", keys_col="kk",
                          exact="none").to_pandas()
    got = set(pre["payload"].tolist())
    assert got >= set(want)
    assert len(got) <= len(want) * 1.10 + 50


def test_bloom_semi_join_string_keys(ray_session):
    """String keys go through the same vectorized hash (pandas
    hash_array) on both build and probe sides."""
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_semi_join
    fact = pa.table({"s": pa.array(["a", "b", "c", "d", None, "e"] * 50),
                     "i": pa.array(np.arange(300))})
    keys = pa.table({"s": pa.array(["b", "e", "zz"])})
    out = bloom_semi_join(rd.from_arrow(fact).repartition(3),
                          rd.from_arrow(keys), "s").to_pandas()
    assert sorted(set(out["s"])) == ["b", "e"]
    assert len(out) == 100


def test_bloom_anti_join_exact_modes(ray_session):
    """bloom_anti_join: both exact modes reproduce the naive NOT-IN-set
    answer (null fact keys kept); the definite stream alone is a SUBSET
    of the true anti-output (bloom has no false negatives)."""
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_anti_join
    rng = np.random.default_rng(11)
    fact_keys = rng.integers(0, 50_000, 10_000)
    fact = pa.table({
        "k": pa.array([None if i % 89 == 0 else int(v)
                       for i, v in enumerate(fact_keys)], type=pa.int64()),
        "payload": pa.array(np.arange(10_000))})
    member = rng.choice(50_000, 2_000, replace=False)
    keys = pa.table({"kk": pa.array(
        [None] + [int(v) for v in member], type=pa.int64())})
    in_set = set(int(v) for v in member)
    want = sorted(int(p) for kv, p in zip(fact["k"].to_pylist(),
                                          fact["payload"].to_pylist())
                  if kv is None or kv not in in_set)
    fact_ds = rd.from_arrow(fact).repartition(6)
    keys_ds = rd.from_arrow(keys).repartition(4)
    for mode in ("broadcast", "shuffle"):
        out = bloom_anti_join(fact_ds, keys_ds, "k", keys_col="kk",
                              exact=mode).to_pandas()
        assert sorted(out["payload"].tolist()) == want, mode
        assert list(out.columns) == ["k", "payload"], mode


def test_bloom_anti_join_empty_keys(ray_session):
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_anti_join
    fact = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    keys = pa.table({"k": pa.array([], type=pa.int64())})
    out = bloom_anti_join(rd.from_arrow(fact), rd.from_arrow(keys),
                          "k").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]


def test_bloom_anti_join_empty_keys_shuffle_mode(ray_session):
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_anti_join
    fact = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    for keys in (pa.table({"k": pa.array([], type=pa.int64())}),
                 pa.table({"k": pa.array([None, None], type=pa.int64())})):
        out = bloom_anti_join(rd.from_arrow(fact), rd.from_arrow(keys),
                              "k", exact="shuffle").to_pandas()
        assert sorted(out["k"].tolist()) == [1, 2, 3]


def test_quantile_sketch_rank_error_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.sketch import quantile_sketch
    rng = np.random.default_rng(7)
    vals = np.r_[rng.lognormal(3.0, 2.0, 60000), [np.nan] * 50]
    v = vals.tolist(); v[13] = None   # null dropped like NaN
    ds = rd.from_arrow(pa.table({"value": pa.array(v, type=pa.float64())})) \
        .repartition(17)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    out = quantile_sketch(ds, "value", qs, k=1024).to_pandas()
    clean = np.sort(vals[~np.isnan(vals)])
    for q, val in zip(out["q"], out["value"]):
        rank = np.searchsorted(clean, val) / len(clean)
        # 3 compaction levels at k=1024 → ≤ ~0.3% theoretical; assert 1%
        assert abs(rank - q) < 0.01, (q, rank)
    # determinism: same input → identical sketch output
    out2 = quantile_sketch(ds, "value", qs, k=1024).to_pandas()
    assert out["value"].tolist() == out2["value"].tolist()


def test_quantile_sketch_small_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.sketch import quantile_sketch
    # fewer points than k → exact quantile values (no compaction)
    ds = rd.from_arrow(pa.table({"value": pa.array(
        np.arange(100, dtype=np.float64))})).repartition(3)
    out = quantile_sketch(ds, "value", [0.5], k=1024).to_pandas()
    assert abs(out["value"][0] - 50.0) <= 1.0
    empty = rd.from_arrow(pa.table({"value": pa.array([], type=pa.float64())}))
    oute = quantile_sketch(empty, "value", [0.5, 0.9], k=64).to_pandas()
    assert len(oute) == 2 and oute["value"].isna().all()


def test_cms_one_sided_and_tight(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.sketch import cms_build, cms_estimate
    rng = np.random.default_rng(13)
    # zipf-ish key distribution with known exact counts
    keys = rng.zipf(1.5, 50000) % 997
    tbl = pa.table({"user_id": pa.array(keys.astype(np.int64))})
    ds = rd.from_arrow(tbl).repartition(11)
    cms = cms_build(ds, "user_id", depth=4, width=4096)
    assert cms.shape == (4, 4096)
    assert cms.sum() == 4 * len(keys)  # each occurrence lands once per row
    uk, true = np.unique(keys, return_counts=True)
    est = cms_estimate(cms, uk)
    assert (est >= true).all()                    # never undercounts
    eps_bound = np.e / 4096 * len(keys)
    assert (est - true).max() <= eps_bound        # CM guarantee
    # determinism
    cms2 = cms_build(ds, "user_id", depth=4, width=4096)
    assert (cms == cms2).all()


def test_interval_overlap_join_exactly_once(ray_session):
    """Bucket-replication interval join: exact pair set vs brute force,
    exactly-once across buckets (long intervals spanning many buckets),
    touching intervals do NOT match (half-open semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from timezonemap_ray.stages.join import interval_overlap_join
    rng = np.random.default_rng(21)
    n = 300
    keys = rng.integers(0, 3, n)
    lo = rng.integers(0, 1000, n).astype(np.int64)
    span = rng.integers(1, 80, n).astype(np.int64)  # up to 8 buckets @ W=10
    tbl = pa.table({"rid": pa.array(np.arange(n), type=pa.int64()),
                    "k": pa.array([f"k{int(x)}" for x in keys]),
                    "lo": pa.array(lo),
                    "hi": pa.array(lo + span)})
    left = rd.from_arrow(tbl).repartition(4)
    right = rd.from_arrow(tbl).repartition(3)
    out = interval_overlap_join(left, right, "k", "lo", "hi",
                                "rid", "rid", bucket_width=10).to_pandas()
    got = sorted(map(tuple, out[["id_l", "id_r"]].to_numpy()))
    # brute force including self-pairs and both orders
    want = sorted(
        (int(i), int(j))
        for i in range(n) for j in range(n)
        if keys[i] == keys[j] and lo[i] < lo[j] + span[j]
        and lo[j] < lo[i] + span[i])
    assert got == want                        # exact AND exactly-once
    # touching intervals [0,10) and [10,20) never pair
    t2 = pa.table({"rid": pa.array([0, 1], type=pa.int64()),
                   "k": pa.array(["x", "x"]),
                   "lo": pa.array([0, 10], type=pa.int64()),
                   "hi": pa.array([10, 20], type=pa.int64())})
    o2 = interval_overlap_join(rd.from_arrow(t2), rd.from_arrow(t2),
                               "k", "lo", "hi", "rid", "rid",
                               bucket_width=4).to_pandas()
    assert set(map(tuple, o2[["id_l", "id_r"]].to_numpy())) == {(0, 0),
                                                                (1, 1)}


def test_asof_join_time_salted_timestamp_columns(ray_session):
    """Round-5 review findings: (1) Ray's Min/Max aggregate returns plain
    datetime.datetime, which _time_i8 must accept; (2) bucket arithmetic
    must normalize the column to ns — a timestamp[us] view in its native
    unit would collapse every row into bucket 0, silently de-activating
    the de-skew. Salted and unsalted plans must agree on timestamp[us]
    columns, and the salted plan must actually spread buckets."""
    import pandas as pd
    import ray.data as rd

    from timezonemap_ray.stages.join import _tv_ns_i8, _time_i8

    rng = np.random.default_rng(13)
    n_l, n_r = 2_000, 600
    base_ts = pd.Timestamp("2024-01-01").value
    lk = np.where(rng.random(n_l) < 0.9, 0, rng.integers(1, 4, n_l))
    lt_ns = base_ts + rng.permutation(n_l * 5)[:n_l] * 1_000_000
    rk = np.where(rng.random(n_r) < 0.9, 0, rng.integers(1, 4, n_r))
    rt_ns = base_ts + (rng.permutation(n_r * 5)[:n_r] * 5 + 3) * 1_000_000
    rv = np.arange(n_r, dtype=np.int64)
    # store as timestamp[us] — the parquet default
    lt = pa.array(lt_ns.astype("datetime64[ns]")).cast(pa.timestamp("us"))
    rt = pa.array(rt_ns.astype("datetime64[ns]")).cast(pa.timestamp("us"))
    left = rd.from_arrow(pa.table({"k": lk, "t": lt})).repartition(8)
    right = rd.from_arrow(
        pa.table({"rk": rk, "rt": rt, "val": rv})).repartition(8)

    def run(**kw):
        df = asof_join(left, right, key="k", right_key="rk", on="t",
                       right_on="rt", value_cols=["val"], **kw).to_pandas()
        return df.sort_values(["k", "t"]).reset_index(drop=True)

    base = run()
    got = run(time_salt=4)              # crashed before the fix
    assert got.equals(base)
    # ns bounds (pd.Timestamp.value convention) must also agree
    got = run(time_salt=4, time_bounds=(int(min(lt_ns.min(), rt_ns.min())),
                                        int(max(lt_ns.max(), rt_ns.max()))))
    assert got.equals(base)
    # the de-skew must actually spread: recompute the bucket assignment
    # the plan uses and assert >1 occupied bucket (the us-vs-ns bug put
    # every row in bucket 0)
    lo = min(_time_i8(v) for v in (lt_ns.min(), rt_ns.min()))
    hi = max(_time_i8(v) for v in (lt_ns.max(), rt_ns.max()))
    width = max(1, (hi - lo) // 4 + 1)
    bkt = np.clip((_tv_ns_i8(lt) - lo) // width, 0, 3)
    assert len(np.unique(bkt)) > 1


def test_range_join_int64_exact_above_2_53(ray_session):
    """Integer bounds must not round through float64: at ns-epoch
    magnitudes a value 2 below an interval start has the same float64 as
    the start and was mislabeled inside (review-found)."""
    import ray.data as rd
    lo = 1_700_000_000_000_000_000
    ds = rd.from_arrow(pa.table({"v": pa.array(
        [lo - 2, lo, lo + 5], type=pa.int64())}))
    out = range_join(ds, lows=[lo], highs=[lo + 10], labels=["in"],
                     value_col="v").to_pandas().sort_values("v")
    got = out["bucket"].astype("object") \
        .where(out["bucket"].notna(), None).tolist()
    assert got == [None, "in", "in"]


def test_range_join_zero_width_interval_accepted(ray_session):
    """A zero-width [5,5) sharing its lo with [5,8) overlaps nothing but
    was spuriously rejected when argsort put it second (review-found:
    lexsort by (lo, hi) fixes the tie order)."""
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"v": [5.0, 6.0, 9.0]}))
    out = range_join(ds, lows=[5, 5], highs=[8, 5], labels=["b", "a"],
                     value_col="v").to_pandas().sort_values("v")
    got = out["bucket"].astype("object") \
        .where(out["bucket"].notna(), None).tolist()
    assert got == ["b", "b", None]


def test_asof_join_null_keys_never_match(ray_session):
    """pd.merge_asof by-groups never match null keys; the dictionary
    index NaN->int64 cast made nulls match EACH OTHER (review-found).
    Null-key left rows stay in the output with null values."""
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", None, "a"]),
        "t": pa.array([10, 10, 5], type=pa.int64()),
        "lid": pa.array([0, 1, 2], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", None]),
        "t": pa.array([7, 1], type=pa.int64()),
        "val": pa.array(["r-a", "r-null"]),
    }))
    out = asof_join(left, right, key="k", right_key="k", on="t",
                    right_on="t", value_cols=["val"]).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    assert out["val"].where(out["val"].notna(), None).tolist() \
        == ["r-a", None, None]


def test_bloom_semi_join_rejects_unknown_mode(ray_session):
    """bloom_semi_join silently fell through to the shuffle plan on a
    typo'd mode while bloom_anti_join raised (review-found)."""
    import ray.data as rd
    from timezonemap_ray.stages.join import bloom_semi_join
    fact = rd.from_arrow(pa.table({"k": [1, 2]}))
    keys = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="unknown exact mode"):
        bloom_semi_join(fact, keys, "k", exact="broadcst")


def test_broadcast_lookup_null_dim_key_gives_null(ray_session):
    """A null dimension key must not capture null fact keys
    (review-found: pc.index_in's default semantics match null->null)."""
    import ray.data as rd
    from timezonemap_ray.stages.join import broadcast_lookup
    fact = rd.from_arrow(pa.table({"k": pa.array([1, None, 2])}))
    dim = pa.table({"k": pa.array([1, None], type=pa.int64()),
                    "name": pa.array(["one", "NULLROW"])})
    out = broadcast_lookup(fact, dim, key="k", small_key="k",
                           value_cols=["name"]).to_pandas()
    vals = out.sort_values("k", na_position="last")["name"] \
        .where(lambda s: s.notna(), None).tolist()
    assert vals == ["one", None, None]
