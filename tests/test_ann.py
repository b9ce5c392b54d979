"""ANN similarity search: brute-force == numpy oracle == DuckDB; IVF recall."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from timezonemap_ray.stages import ann


@pytest.fixture(scope="module")
def emb_path(sf_dir):
    return f"{sf_dir}/embeddings.parquet"


@pytest.fixture(scope="module")
def queries(emb_path):
    import pyarrow.parquet as pq
    t = pq.read_table(emb_path)
    ids = t["vec_id"].to_numpy()[:5]
    mat = np.array(t["embedding"].to_pylist()[:5], dtype=np.float64)
    return ids, mat


def test_brute_topk_matches_numpy(ray_session, emb_path, queries):
    import pyarrow.parquet as pq
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    out = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()

    t = pq.read_table(emb_path)
    all_ids = t["vec_id"].to_numpy()
    allv = ann._normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    qn = ann._normalize(qmat)
    sims = allv @ qn.T
    for qi, qid in enumerate(qids):
        order = np.lexsort((all_ids, -sims[:, qi]))[:10]
        expect = all_ids[order].tolist()
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == expect, qid


def test_brute_topk_matches_duckdb(ray_session, emb_path, queries):
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    out = ann.brute_topk(ds, qids, qmat, k=10).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb_path}')")
    qlist = ",".join(str(int(q)) for q in qids)
    sql = con.sql(f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id IN ({qlist})),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(e.embedding, q.qv) AS score
            FROM embeddings e CROSS JOIN q)
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, vec_id) AS rank
        FROM scored
        QUALIFY rank <= 10
        ORDER BY query_id, rank""").df()
    pd.testing.assert_frame_equal(
        out[["query_id", "vec_id", "rank"]],
        sql.astype({"query_id": out["query_id"].dtype,
                    "vec_id": out["vec_id"].dtype,
                    "rank": out["rank"].dtype}))


def test_ivf_recall(ray_session, emb_path, queries):
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    brute = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()
    ivf = ann.ivf_topk(ds, qids, qmat, k=10, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qid in qids:
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        v = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(b & v) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 lists
    # each query's own vector is its top hit in both
    for qid in qids:
        assert len(ivf[(ivf["query_id"] == qid) & (ivf["rank"] == 1)]) == 1
        assert brute[(brute["query_id"] == qid) &
                     (brute["rank"] == 1)]["vec_id"].iloc[0] == qid


def test_media_stages(ray_session):
    import ray.data as rd
    from timezonemap_ray.stages import media
    t = media.synth_media_table([f"media://blob/{i}" for i in range(10)],
                                kind="video")
    ds = rd.from_arrow(t)
    decoded = ds.map_batches(media.MediaDecoder, batch_format="pyarrow",
                             batch_size=media.SUGGESTED_BATCH,
                             concurrency=2).to_pandas()
    assert len(decoded) == 10
    assert len(decoded["features"].iloc[0]) == 32
    assert decoded["decode_error"].isna().all()
    assert (decoded["decoded_bytes"] == 64 * 48 * 3).all()  # real pixels
    # determinism: same payload → same features
    again = ds.map_batches(media.MediaDecoder, batch_format="pyarrow",
                           batch_size=media.SUGGESTED_BATCH,
                           concurrency=2).to_pandas()
    assert decoded["features"].iloc[3] == pytest.approx(again["features"].iloc[3])

    frames = ds.map_batches(media.FrameSampler, batch_format="pyarrow",
                            concurrency=2).to_pandas()
    assert len(frames) == 10 * 5  # 5000ms / 1000ms
    assert (frames["frame_w"] == 64).all()  # real demuxed frame dims
    imgs = rd.from_arrow(media.synth_media_table(
        [f"media://img/{i}" for i in range(6)], kind="image", fmt="bmp"))
    resized = imgs.map_batches(media.ImageResizer, batch_format="pyarrow",
                               concurrency=2).to_pandas()
    assert (resized["resized_w"] == 224).all()
    # the resized payload is a REAL 224x224 PPM
    from timezonemap_ray.stages import codec
    img = codec.decode_image(resized["payload"].iloc[0])
    assert img.shape == (224, 224, 3)


def test_codec_roundtrips():
    import numpy as np
    from timezonemap_ray.stages import codec
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)  # odd width
    assert (codec.decode_ppm(codec.encode_ppm(img)) == img).all()
    assert (codec.decode_bmp(codec.encode_bmp(img)) == img).all()
    vid = codec.encode_video([img, img[::-1]], frame_interval_ms=500)
    assert codec.video_info(vid) == (2, 500)
    assert (codec.decode_video_frame(vid, 1) == img[::-1]).all()
    r = codec.resize_nearest(img, 10, 8)
    assert r.shape == (8, 10, 3)
    with pytest.raises(ValueError):
        codec.decode_image(b"\x89PNG\r\n\x1a\nxxxx")  # real codec: malformed
    with pytest.raises(ValueError):
        codec.decode_image(b"garbage")


def test_media_decoder_flags_bad_payload(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from timezonemap_ray.stages import media
    t = media.synth_media_table(["media://img/ok"], kind="image")
    bad = pa.table({"media_id": pa.array([1], type=pa.int64()),
                    "media_ref": pa.array(["media://img/bad"]),
                    "kind": pa.array(["image"]),
                    "payload": pa.array([b"not an image"], type=pa.binary()),
                    "width": pa.array([0], type=pa.int32()),
                    "height": pa.array([0], type=pa.int32()),
                    "duration_ms": pa.array([0], type=pa.int32())})
    ds = rd.from_arrow(pa.concat_tables([t, bad]))
    out = ds.map_batches(media.MediaDecoder, batch_format="pyarrow",
                         concurrency=1).to_pandas().sort_values("media_id")
    assert out["decode_error"].iloc[0] is None
    assert "ValueError" in out["decode_error"].iloc[1]  # flagged, not thrown


def test_ivf_physical_pruning(ray_session, emb_path, queries, tmp_path):
    """The IVF index is physically partitioned by centroid and a query
    reads only the probed partitions: bytes-read fraction ≈ nprobe share."""
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    idx_dir = str(tmp_path / "ivf")
    ann.ivf_build(ds, idx_dir, n_centroids=8)
    out, frac = ann.ivf_query(idx_dir, qids, qmat, k=10, nprobe=2)
    assert 0.0 < frac < 1.0          # strictly pruned
    # 5 queries × 2 probes can union to ≤ 10 of 8 partitions; require that
    # at least some partitions were skipped and results are well-formed
    assert set(out.column_names) == {"query_id", "vec_id", "rank", "score"}
    assert out.num_rows > 0
    # wider probe reads strictly more bytes
    _, frac_all = ann.ivf_query(idx_dir, qids, qmat, k=10, nprobe=8)
    assert frac <= frac_all == 1.0


def test_audio_codec_and_features(ray_session):
    import numpy as np
    import ray.data as rd
    from timezonemap_ray.stages import codec, media
    # WAV round-trip
    rng = np.random.default_rng(3)
    sig = (rng.normal(0, 5000, 1234)).astype(np.int16)
    back, rate = codec.decode_wav(codec.encode_wav(sig, 8000))
    assert rate == 8000 and (back == sig).all()
    # audio stage end-to-end: real PCM decode + spectral features
    t = media.synth_media_table([f"media://aud/{i}" for i in range(6)],
                                kind="audio")
    out = rd.from_arrow(t).map_batches(media.MediaDecoder,
                                       batch_format="pyarrow",
                                       concurrency=2).to_pandas()
    assert out["decode_error"].isna().all()
    assert (out["decoded_bytes"] == 16000 * 2).all()  # 1s of PCM16
    # different tones -> different spectra
    f0 = np.array(out["features"].iloc[0])
    f1 = np.array(out["features"].iloc[1])
    assert not np.allclose(f0, f1)
    # duration feature (index 2) is ~1.0s
    assert abs(f0[2] - 1.0) < 1e-3


def test_ivf_rebuild_same_dir_no_duplicates(ray_session, emb_path, queries,
                                            tmp_path):
    """Rebuilding an IVF index into the same dir must wipe the old
    partitions (append-duplication hazard)."""
    import ray.data as rd
    qids, qmat = queries
    idx_dir = str(tmp_path / "ivf2")
    ds = rd.read_parquet(emb_path)
    ann.ivf_build(ds, idx_dir, n_centroids=4)
    ann.ivf_build(ds, idx_dir, n_centroids=4)  # rebuild
    out, _ = ann.ivf_query(idx_dir, qids, qmat, k=10, nprobe=4)
    df = out.to_pandas()
    # no duplicated (query, vec) rows from doubled files
    assert not df.duplicated(["query_id", "vec_id"]).any()


def test_frame_sampler_flags_truncated_video(ray_session):
    import pyarrow as pa
    from timezonemap_ray.stages import media
    t = media.synth_media_table(["media://v/ok"], kind="video")
    import struct
    trunc = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "media_ref": pa.array(["media://v/trunc"]),
        "kind": pa.array(["video"]),
        "payload": pa.array([b"TZV1" + struct.pack("<II", 3, 1000)],
                            type=pa.binary()),  # header only, no frames
        "width": pa.array([0], type=pa.int32()),
        "height": pa.array([0], type=pa.int32()),
        "duration_ms": pa.array([3000], type=pa.int32())})
    batch = pa.concat_tables([t, trunc])
    out = media.FrameSampler()(batch)
    # good video contributes 5 frames; truncated one is skipped, not thrown
    assert out.num_rows == 5
    assert set(out["media_id"].to_pylist()) == {0}
    # resizer flags garbage instead of claiming a resize
    r = media.ImageResizer()(trunc)
    assert r["resize_error"][0].as_py() is not None
    assert r["resized_w"][0].as_py() is None


def test_frame_sampler_all_or_nothing(ray_session):
    """A video whose header promises more frames than the stream contains
    emits NO rows (all-or-nothing), not a partial sample."""
    import struct
    import pyarrow as pa
    from timezonemap_ray.stages import codec, media
    import numpy as np
    fr = np.zeros((4, 4, 3), dtype=np.uint8)
    good = codec.encode_video([fr, fr, fr, fr, fr], frame_interval_ms=1000)
    # keep header + only the first 2 frames' bytes
    pos = 12
    for _ in range(2):
        ln = struct.unpack_from("<I", good, pos)[0]
        pos += 4 + ln
    partial = good[:pos]
    t = pa.table({
        "media_id": pa.array([7], type=pa.int64()),
        "media_ref": pa.array(["media://v/partial"]),
        "kind": pa.array(["video"]),
        "payload": pa.array([partial], type=pa.binary()),
        "width": pa.array([4], type=pa.int32()),
        "height": pa.array([4], type=pa.int32()),
        "duration_ms": pa.array([5000], type=pa.int32())})
    out = media.FrameSampler()(t)
    assert out.num_rows == 0  # frames 0-1 decode, frame 2 fails -> discard all


def test_pq_recall_and_code_shape(ray_session, emb_path, queries):
    import pyarrow.parquet as pq
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    exact = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()
    # codes-only ADC (no re-rank): moderate recall on near-random vectors
    adc = ann.pq_topk(ds, qids, qmat, k=10, m=16, ks=256).to_pandas()
    # with exact re-rank of a 50-candidate shortlist: near-perfect
    rr = ann.pq_topk(ds, qids, qmat, k=10, m=16, ks=256,
                     rerank_l=50).to_pandas()

    def recall(approx):
        per = []
        for q in set(qids.tolist()):
            a = set(exact[exact.query_id == q].vec_id)
            b = set(approx[approx.query_id == q].vec_id)
            per.append(len(a & b) / len(a))
        return float(np.mean(per))

    assert recall(adc) >= 0.5
    assert recall(rr) >= 0.9
    # encode: 16 uint8 codes per vector (16× compression of 64 f32 dims)
    t = pq.read_table(emb_path)
    sample = np.array(t["embedding"].to_pylist()[:300], dtype=np.float64)
    cbs = ann.pq_train(sample, m=16, ks=256)
    assert cbs.shape == (16, 256, 4)
    codes = ann.pq_encode(ds, cbs).to_pandas()
    assert len(codes) == t.num_rows
    assert all(len(c) == 16 for c in codes["codes"].head(20))
    # determinism: same input → identical codes + identical top-k
    codes2 = ann.pq_encode(ds, cbs).to_pandas()
    a = codes.sort_values("vec_id").reset_index(drop=True)
    b = codes2.sort_values("vec_id").reset_index(drop=True)
    assert all((x == y).all() for x, y in zip(a["codes"], b["codes"]))
    rr2 = ann.pq_topk(ds, qids, qmat, k=10, m=16, ks=256,
                      rerank_l=50).to_pandas()
    pd.testing.assert_frame_equal(rr, rr2)


def test_pq_clustered_data_cluster_retrieval_and_rerank(ray_session):
    """On clustered vectors PQ codes collapse WITHIN a tight cluster (all
    members share codes — fine ranking there is undecidable by design),
    but the ADC scan must still retrieve from the RIGHT cluster, and the
    exact re-rank pass must recover true top-k recall."""
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (8, 32))
    x = np.vstack([c + rng.normal(0, 0.05, (250, 32)) for c in centers])
    labels = np.repeat(np.arange(8), 250)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(x)), type=pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in x]),
    })
    ds = rd.from_arrow(tbl).repartition(5)
    qrows = [10, 300, 700, 1500]
    qids, qmat = np.arange(4), x[qrows]
    adc = ann.pq_topk(ds, qids, qmat, k=10, m=8, ks=64).to_pandas()
    # every ADC hit comes from the query's own cluster
    for qi, row in zip(qids.tolist(), qrows):
        hits = adc[adc.query_id == qi]["vec_id"].to_numpy()
        assert (labels[hits] == labels[row]).all()
    # exact re-rank recovers the true within-cluster top-k
    exact = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()
    # rerank_l must cover the ADC tie class: all 250 cluster members
    # share one code word here, so a 100-candidate shortlist would
    # tie-truncate; 250 captures the full cluster
    rr = ann.pq_topk(ds, qids, qmat, k=10, m=8, ks=64,
                     rerank_l=250).to_pandas()
    per = []
    for q in qids.tolist():
        a = set(exact[exact.query_id == q].vec_id)
        b = set(rr[rr.query_id == q].vec_id)
        per.append(len(a & b) / len(a))
    assert float(np.mean(per)) >= 0.9, per


def test_ivfpq_recall_pruning_compression(ray_session, emb_path, queries,
                                          tmp_path):
    import ray.data as rd
    qids, qmat = queries
    ds = rd.read_parquet(emb_path)
    exact = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()
    idx = str(tmp_path / "ivfpq")
    cents, cbs = ann.ivfpq_build(ds, idx, n_centroids=8, m=16, ks=256)
    assert cents.shape[0] == 8 and cbs.shape == (16, 256, 4)
    # full probe + rerank recovers brute results exactly
    out, frac = ann.ivfpq_query(idx, qids, qmat, k=10, nprobe=8,
                                rerank_ds=ds, rerank_l=100)
    ap = out.to_pandas()
    rec = np.mean([len(set(exact[exact.query_id == q].vec_id)
                       & set(ap[ap.query_id == q].vec_id)) / 10
                   for q in set(qids.tolist())])
    assert rec >= 0.95
    # partial probe physically prunes code bytes
    out2, frac2 = ann.ivfpq_query(idx, qids, qmat, k=10, nprobe=2)
    assert 0.0 < frac2 < 1.0
    assert out2.num_rows > 0
    # probe-coverage-bounded recall without rerank still beats chance
    ap2 = ann.ivfpq_query(idx, qids, qmat, k=10, nprobe=4)[0].to_pandas()
    rec2 = np.mean([len(set(exact[exact.query_id == q].vec_id)
                        & set(ap2[ap2.query_id == q].vec_id)) / 10
                    for q in set(qids.tolist())])
    assert rec2 >= 0.3
    # the codes index stores no float vectors: smaller than the IVF float
    # index even with per-partition parquet overhead at 500 rows
    import subprocess
    ann.ivf_build(ds, str(tmp_path / "ivf"), n_centroids=8)
    a = int(subprocess.check_output(
        ["du", "-sb", idx + "/codes"]).split()[0])
    b = int(subprocess.check_output(
        ["du", "-sb", str(tmp_path / "ivf/vectors")]).split()[0])
    assert b / a > 1.8


def test_ivfpq_residual_encoding_improves_clustered(ray_session, tmp_path):
    """Residual PQ (FAISS-standard) quantizes the tighter (x − centroid)
    spread: on clustered vectors its codes-only recall beats direct
    encoding; the flag round-trips through the index directory."""
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (8, 32))
    x = np.vstack([c + rng.normal(0, 0.15, (250, 32)) for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(x)), type=pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in x])})
    ds = rd.from_arrow(tbl).repartition(5)
    qids, qmat = np.arange(4), x[[10, 300, 700, 1500]]
    exact = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()

    def recall(ap):
        return float(np.mean(
            [len(set(exact[exact.query_id == q].vec_id)
                 & set(ap[ap.query_id == q].vec_id)) / 10
             for q in qids.tolist()]))

    recs = {}
    for resid in (False, True):
        idx = str(tmp_path / f"ivfpq_{resid}")
        ann.ivfpq_build(ds, idx, n_centroids=8, m=8, ks=64,
                        residual=resid)
        adc = ann.ivfpq_query(idx, qids, qmat, k=10,
                              nprobe=2)[0].to_pandas()
        recs[resid] = recall(adc)
    assert recs[True] >= recs[False]
    assert recs[True] >= 0.4
    # rerank on top of residual codes stays near-exact within the probes
    idx = str(tmp_path / "ivfpq_True")
    rr = ann.ivfpq_query(idx, qids, qmat, k=10, nprobe=8,
                         rerank_ds=ds, rerank_l=250)[0].to_pandas()
    assert recall(rr) >= 0.95


def test_opq_rotation_improves_anisotropic(ray_session):
    """Parametric OPQ: on variance-concentrated embeddings the balanced
    rotation beats plain PQ codes-only recall; the rotation matrix is
    orthogonal (distance semantics unchanged)."""
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(3)
    scales = np.r_[np.full(8, 10.0), np.full(24, 0.3)]
    x = rng.normal(0, 1, (2000, 32)) * scales
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(x)), type=pa.int64()),
        "embedding": pa.array([r.astype(np.float32) for r in x])})
    ds = rd.from_arrow(tbl).repartition(5)
    qids, qmat = np.arange(5), x[[3, 400, 900, 1500, 1999]]
    exact = ann.brute_topk(ds, qids, qmat, k=10).to_pandas()

    def recall(ap):
        return float(np.mean(
            [len(set(exact[exact.query_id == q].vec_id)
                 & set(ap[ap.query_id == q].vec_id)) / 10
             for q in qids.tolist()]))

    plain = ann.pq_topk(ds, qids, qmat, k=10, m=8, ks=64).to_pandas()
    rot = ann.pq_topk_rotated(ds, qids, qmat, k=10, m=8,
                              ks=64).to_pandas()
    assert recall(rot) >= recall(plain)
    assert recall(rot) >= 0.8
    r = ann.opq_rotation(x[:500], m=8)
    assert np.allclose(r @ r.T, np.eye(32), atol=1e-9)  # orthogonal
    # the allocation actually balances per-subspace variance (the naive
    # negative-log greedy degenerated to the identity permutation)
    xr = ann._normalize(x) @ r
    var = xr.var(axis=0).reshape(8, 4).sum(axis=1)
    assert var.max() / var.min() < 2.0


def test_mips_topk_int_partition_independent(ray_session):
    """Integer MIPS top-k cannot change under repartitioning, and the
    (dot desc, id asc) order matches a numpy reference."""
    import pyarrow as pa
    import ray.data as rd

    from timezonemap_ray.stages.ann import mips_topk_int
    rng = np.random.default_rng(9)
    n, d = 200, 16
    x = rng.integers(-5, 6, size=(n, d)).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "counts": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), d)})
    qids = np.array([3, 7], dtype=np.int64)
    qmat = x[[3, 7]]
    ref_out = None
    for parts in (1, 8):
        out = mips_topk_int(rd.from_arrow(tbl).repartition(parts),
                            qids, qmat, k=5).to_pandas()
        if ref_out is None:
            ref_out = out
        else:
            pd.testing.assert_frame_equal(ref_out, out)
    # numpy reference
    for qi, qid in enumerate(qids):
        dots = x @ qmat[qi]
        order = np.lexsort((np.arange(n), -dots))[:5]
        sub = ref_out[ref_out["query_id"] == qid]
        assert sub["vec_id"].tolist() == order.tolist()
        assert sub["dot"].tolist() == dots[order].tolist()
    # self top-1
    assert ref_out[ref_out["query_id"] == 3].iloc[0]["vec_id"] in (3,) or \
        ref_out[ref_out["query_id"] == 3].iloc[0]["dot"] >= int(x[3] @ x[3])
