"""Distributed BPE merge learning (tokenizer training).

The reference has no tokenizer machinery (SURVEY §2 — it is a geo
engine); a training-data pipeline does: byte-pair-encoding merge rules
are learned from corpus statistics before any model sees a token
(Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL'16 — public method).

Scale shape — the part that matters at 100 TB:

- **Learning runs on the VOCABULARY, not the corpus.** Pass 0 is the
  existing ``terms.term_counts`` partial-aggregate (tokens never
  shuffle; (term, n) partials do). Every subsequent pass is over the
  (word, count) table — millions of rows at crawl scale, not trillions.
- **One pass per merge, partials only.** Each iteration broadcasts the
  merge list learned so far (K × 2 short strings via ``ray.put``),
  re-symbolizes each word block-locally, and emits per-block
  (pair, weighted-count) PARTIALS — a dict fold on the driver picks the
  global argmax (count desc, pair lexicographically asc — the
  deterministic tie-break). Nothing corpus-sized moves after pass 0.
- **Determinism.** Counts are exact integers and the tie-break is
  total, so the learned merge table is independent of partitioning —
  asserted against a pure-Python reference in tests (no SQL twin:
  applying K merges is an iterative rewrite DuckDB cannot express
  without per-position recursion; the vocabulary input to pass 1 IS
  SQL-checkable via the oracle-checked ``vocab_top_terms``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _apply_merges(symbols: list, merges: list) -> list:
    """Apply learned merges IN LEARNED ORDER, each greedily left-to-right
    (the classic BPE apply)."""
    for left, right in merges:
        out = []
        i = 0
        while i < len(symbols):
            if (i + 1 < len(symbols) and symbols[i] == left
                    and symbols[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def _pair_counts_block(words, counts, merges) -> dict:
    """(pair → weighted count) for one vocab block under current merges."""
    acc: dict = {}
    for w, n in zip(words, counts):
        syms = _apply_merges(list(w), merges)
        for a, b in zip(syms, syms[1:]):
            k = (a, b)
            acc[k] = acc.get(k, 0) + int(n)
    return acc


def bpe_learn(vocab_ds, n_merges: int = 8, word_col: str = "term",
              count_col: str = "n") -> pa.Table:
    """Learn ``n_merges`` BPE merges from a (word, count) vocabulary
    Dataset → Table (rank, left, right, pair_count). Stops early when no
    pair occurs twice."""
    import ray

    merges: list = []
    rows = []
    for rank in range(n_merges):
        mref = ray.put(list(merges))

        def partial(b: pa.Table) -> pa.Table:
            acc = _pair_counts_block(
                b[word_col].to_pylist(),
                b[count_col].to_numpy(zero_copy_only=False),
                ray.get(mref))
            if not acc:
                return pa.table({"l": pa.array([], type=pa.string()),
                                 "r": pa.array([], type=pa.string()),
                                 "n": pa.array([], type=pa.int64())})
            ks = list(acc.keys())
            return pa.table({
                "l": pa.array([k[0] for k in ks], type=pa.string()),
                "r": pa.array([k[1] for k in ks], type=pa.string()),
                "n": pa.array([acc[k] for k in ks], type=pa.int64())})

        total: dict = {}
        for b in vocab_ds.map_batches(partial, batch_format="pyarrow") \
                         .iter_batches(batch_size=None, batch_format="pyarrow"):
            for l, r, n in zip(b["l"].to_pylist(), b["r"].to_pylist(),
                               b["n"].to_pylist()):
                k = (l, r)
                total[k] = total.get(k, 0) + n
        if not total:
            break
        # argmax: count desc, then (left, right) lexicographic asc
        best = min(total.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        rows.append({"rank": rank, "left": best[0][0],
                     "right": best[0][1], "pair_count": int(best[1])})
    if not rows:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         "left": pa.array([], type=pa.string()),
                         "right": pa.array([], type=pa.string()),
                         "pair_count": pa.array([], type=pa.int64())})
    return pa.Table.from_pylist(rows)


def bpe_learn_reference(word_counts: dict, n_merges: int = 8) -> list:
    """Single-threaded reference (same recurrence, plain dicts) —
    returns [(left, right, pair_count)] for tests."""
    merges: list = []
    out = []
    for _ in range(n_merges):
        acc: dict = {}
        for w, n in word_counts.items():
            syms = _apply_merges(list(w), merges)
            for a, b in zip(syms, syms[1:]):
                acc[(a, b)] = acc.get((a, b), 0) + n
        if not acc:
            break
        best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        out.append((best[0][0], best[0][1], best[1]))
    return out


def bpe_segment(batch: pa.Table, merges: list, text_col: str = "text",
                out_col: str = "bpe_tokens") -> pa.Table:
    """Apply a learned merge table to documents → list<string> column of
    BPE tokens (per-word greedy apply; whitespace-split words)."""
    texts = batch[text_col].to_pylist()
    out = []
    for t in texts:
        toks = []
        for w in (t or "").split():
            toks.extend(_apply_merges(list(w), merges))
        out.append(toks)
    return batch.append_column(
        out_col, pa.array(out, type=pa.list_(pa.string())))
