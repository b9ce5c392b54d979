"""Dedup-at-scale micro-benchmark (the PERF.md "Dedup at scale" numbers).

100k synthetic docs, 10k of them 1-word-changed near-dups of other docs;
measures wall time + recall/precision for MinHash+LSH (and optionally
SimHash). Deterministic corpus (seeded).

    python jobs/bench_dedup.py [--docs 100000] [--dups 10000] [--op minhash]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu red green blue yellow "
         "purple orange river mountain forest desert ocean valley stone "
         "cloud wind fire data query engine stream batch shuffle join "
         "index vector token model train corpus").split()


def make_corpus(n_docs: int, n_dups: int, doc_len: int = 60, seed: int = 11,
                vocab: int = 0):
    """``vocab=0``: the original 46-word list (a stress corpus — tiny vocab
    means heavy shingle sharing between unrelated docs). ``vocab=N``: an
    N-word synthetic vocabulary (realistic shingle document-frequency)."""
    rng = np.random.default_rng(seed)
    words = ([f"w{i:05d}" for i in range(vocab)] if vocab else WORDS)
    base_n = n_docs - n_dups
    texts = [" ".join(rng.choice(words, size=doc_len))
             for _ in range(base_n)]
    dup_src = rng.integers(0, base_n, size=n_dups)
    truth = []  # (dup_doc_id, src_doc_id)
    for k, s in enumerate(dup_src):
        toks = texts[s].split()
        toks[rng.integers(0, len(toks))] = "CHANGED"
        texts.append(" ".join(toks))
        truth.append((base_n + k, int(s)))
    ids = np.arange(n_docs, dtype=np.int64)
    return pa.table({"doc_id": ids, "text": texts}), truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--dups", type=int, default=10_000)
    ap.add_argument("--op", default="minhash",
                    choices=["minhash", "simhash", "ngram"])
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--vocab", type=int, default=0)
    ap.add_argument("--df-cap", type=int, default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from timezonemap_ray.stages import dedup

    tbl, truth = make_corpus(args.docs, args.dups, vocab=args.vocab)
    # from_arrow yields ONE block; split it so the hasher pool parallelizes
    ds = rd.from_arrow(tbl).repartition(64)
    t0 = time.perf_counter()
    if args.op == "minhash":
        out = dedup.minhash_dedup(ds, threshold=args.threshold).to_pandas()
    elif args.op == "simhash":
        out = dedup.simhash_dedup(ds, max_hamming=3).to_pandas()
    else:
        pairs = dedup.ngram_jaccard_pairs(ds, threshold=args.threshold,
                                          df_cap=args.df_cap)
        out = dedup.cluster_assign(ds.select_columns(["doc_id"]),
                                   pairs).to_pandas()
    wall = time.perf_counter() - t0

    cl = dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))
    found = sum(1 for d, s in truth if cl[d] == cl[s])
    n_flagged = int(out["is_duplicate"].sum())
    print(f'{{"op": "{args.op}", "docs": {args.docs}, "wall_s": {wall:.2f}, '
          f'"recall": "{found}/{len(truth)}", "flagged": {n_flagged}}}')
    ray.shutdown()


if __name__ == "__main__":
    main()
