"""Distributed BPE merge learning vs the single-threaded reference."""

import numpy as np
import pyarrow as pa

from timezonemap_ray.stages import bpe


def test_apply_merges_greedy_left_to_right():
    # "aaaa" with merge (a,a): left-to-right non-overlapping → aa, aa
    assert bpe._apply_merges(list("aaaa"), [("a", "a")]) == ["aa", "aa"]
    assert bpe._apply_merges(list("aaa"), [("a", "a")]) == ["aa", "a"]
    # merge order matters: (a,a) then (aa,a)
    assert bpe._apply_merges(list("aaa"), [("a", "a"), ("aa", "a")]) == \
        ["aaa"]


def test_bpe_learn_matches_reference_and_partitioning(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(13)
    words = ["lower", "lowest", "newer", "newest", "wider", "widest",
             "low", "new", "wide", "er", "est"]
    counts = {w: int(rng.integers(1, 50)) for w in words}
    want = bpe.bpe_learn_reference(counts, n_merges=10)
    tbl = pa.table({"term": pa.array(list(counts)),
                    "n": pa.array([counts[w] for w in counts],
                                  type=pa.int64())})
    for parts in (1, 4):
        got = bpe.bpe_learn(rd.from_arrow(tbl).repartition(parts),
                            n_merges=10).to_pandas()
        got_list = list(zip(got["left"], got["right"], got["pair_count"]))
        assert got_list == want, parts
    # classic corpus: 'e'+'r' / 'e'+'s' style suffix merges appear
    assert len(want) > 3


def test_bpe_segment_roundtrip(ray_session):
    counts = {"hello": 10, "hell": 5, "help": 5}
    merges_tbl = bpe.bpe_learn_reference(counts, n_merges=4)
    merges = [(l, r) for l, r, _ in merges_tbl]
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": ["hello help"]})
    out = bpe.bpe_segment(t, merges).to_pandas()
    toks = out["bpe_tokens"][0]
    assert "".join(toks) == "hellohelp"
    assert len(toks) < len("hellohelp")  # something merged
