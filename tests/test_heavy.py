"""Exact heavy hitters via Misra-Gries candidates (stages/sketch.py)."""

import collections

import numpy as np
import pyarrow as pa

import ray.data as rd

from timezonemap_ray.stages.sketch import _mg_prune, heavy_hitter_terms


def _exact_hh(texts, phi):
    counts = collections.Counter()
    for t in texts:
        counts.update(t.split())
    n = sum(counts.values())
    thresh = int(np.ceil(phi * n))
    rows = [(t, c) for t, c in counts.items() if c >= thresh]
    return sorted(rows, key=lambda r: (-r[1], r[0]))


def _skewed_corpus(seed=5, docs=300):
    # zipf-ish: hot terms appear in most docs, long tail of singletons
    rng = np.random.default_rng(seed)
    hot = [f"hot{i}" for i in range(8)]
    texts = []
    for d in range(docs):
        words = [hot[i] for i in range(8) if rng.random() < 0.8 / (i + 1)]
        words += [f"tail{d}_{j}" for j in range(int(rng.integers(3, 9)))]
        rng.shuffle(words)
        texts.append(" ".join(words))
    return texts


def test_heavy_hitters_exact_vs_counter(ray_session):
    texts = _skewed_corpus()
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(8)
    got = heavy_hitter_terms(ds, phi=0.01)
    want = _exact_hh(texts, 0.01)
    assert list(zip(got["term"].to_pylist(), got["n"].to_pylist())) == want
    assert got.schema.field("n").type == pa.int64()


def test_heavy_hitters_small_k_still_exact(ray_session):
    # force aggressive per-block pruning: k far below block vocab size —
    # the candidate superset guarantee must still keep every true hitter
    texts = _skewed_corpus(seed=11)
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(10)
    got = heavy_hitter_terms(ds, phi=0.02, k=16)
    want = _exact_hh(texts, 0.02)
    assert list(zip(got["term"].to_pylist(), got["n"].to_pylist())) == want
    assert len(want) > 0  # non-vacuous


def test_heavy_hitters_uniform_blocks(ray_session):
    # every token unique: MG prunes whole blocks to the marker row; the
    # token total must survive and the result be empty (nothing ≥ φN)
    texts = [f"u{i}a u{i}b u{i}c" for i in range(200)]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(5)
    got = heavy_hitter_terms(ds, phi=0.01, k=2)
    assert got.num_rows == 0
    assert got.column_names == ["term", "n"]


def test_heavy_hitters_empty_and_degenerate(ray_session):
    ds = rd.from_arrow(pa.table({"text": pa.array([], type=pa.string())}))
    assert heavy_hitter_terms(ds, phi=0.5).num_rows == 0
    ds2 = rd.from_arrow(pa.table({"text": ["", "   ", "x x x"]}))
    got = heavy_hitter_terms(ds2, phi=1.0)  # only a term == ALL tokens
    assert got["term"].to_pylist() == ["x"]
    assert got["n"].to_pylist() == [3]


def test_mg_prune_bound():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, 50, size=100).astype(np.int64)
    terms = pa.array([f"t{i}" for i in range(100)])
    kept_t, kept_c = _mg_prune(terms, counts, k=10)
    assert len(kept_c) <= 10
    # every kept counter understates by exactly the subtracted threshold
    orig = dict(zip(terms.to_pylist(), counts))
    t = None
    for term, c in zip(kept_t.to_pylist(), kept_c):
        d = orig[term] - c
        t = d if t is None else t
        assert d == t and d >= 0


def test_heavy_hitter_keys_exact(ray_session):
    rng = np.random.default_rng(9)
    # skewed int keys: 3 hot users + uniform tail, plus some nulls
    keys = np.concatenate([
        np.repeat([7, 11, 13], [400, 300, 200]),
        rng.integers(1000, 2000, size=600)])
    rng.shuffle(keys)
    vals = keys.astype(object)
    vals[::97] = None  # sprinkle nulls — must be ignored
    t = pa.table({"user_id": pa.array(list(vals), type=pa.int64())})
    ds = rd.from_arrow(t).repartition(7)
    from timezonemap_ray.stages.sketch import heavy_hitter_keys
    got = heavy_hitter_keys(ds, "user_id", phi=0.05, k=8)
    nn = [int(v) for v in vals if v is not None]
    want = _exact_hh([" ".join(str(x) for x in nn)], 0.05)
    want = [(int(k_), c) for k_, c in want]
    assert list(zip(got["user_id"].to_pylist(),
                    got["n"].to_pylist())) == want
    assert got.schema.field("user_id").type == pa.int64()
    assert {7, 11, 13} <= {k_ for k_, _ in want}  # non-vacuous


def test_heavy_hitters_tiny_k_clamped_exact(ray_session):
    # engineered loss case for UNclamped k: one mid-frequency hitter
    # spread thin across blocks beneath many hotter terms — the clamp
    # k >= ceil(1/phi) must keep it a candidate
    texts = []
    for blk in range(20):
        words = []
        for h in range(30):                    # 30 hot terms, count 4/blk
            words += [f"hot{h}"] * 4
        words += ["needle"] * 2                # 2/blk → 40 total
        words += [f"tail{blk}_{j}" for j in range(40)]
        texts.append(" ".join(words))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(20)
    # total tokens = 20*(120+2+40) = 3240; needle=40 ≥ ceil(0.01*3240)=33
    got = heavy_hitter_terms(ds, phi=0.01, k=4)  # k=4 would prune needle
    want = _exact_hh(texts, 0.01)
    assert ("needle", 40) in want
    assert list(zip(got["term"].to_pylist(), got["n"].to_pylist())) == want


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from([0.01, 0.05, 0.2]),
       st.sampled_from([2, 8, 64]), st.integers(1, 12))
def test_heavy_hitters_property_exact(ray_session, seed, phi, k, blocks):
    """For ANY corpus shape / φ / caller-k / partitioning, the result
    equals the naive exact answer (the k-clamp upholds the superset
    guarantee even for adversarially small k)."""
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(1, 60))
    vocab = [f"w{i}" for i in range(int(rng.integers(1, 40)))]
    # zipf-ish skew so some terms clear the threshold
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 30)),
                                 p=probs))
             for _ in range(n_docs)]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(blocks)
    got = heavy_hitter_terms(ds, phi=phi, k=k)
    want = _exact_hh(texts, phi)
    assert list(zip(got["term"].to_pylist(),
                    got["n"].to_pylist())) == want
