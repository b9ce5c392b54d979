"""Term/vocabulary operators over the documents table: distributed word
count, top-k terms, per-doc term frequencies, and TF-IDF distinctive-term
selection.

The reference has no text operators (it is a geo lookup engine — SURVEY
§2); these are training-data-pipeline extensions, built scale-first:

- ``term_counts`` — the canonical partial-aggregation shape: each block
  folds its tokens to (term, n) PARTIALS via dictionary-encode + bincount
  before the groupby, so the shuffle moves one row per distinct term per
  block instead of one row per token (a ~100× reduction on natural text,
  where blocks repeat their vocabulary heavily).
- ``top_terms`` — block-local top-k over the aggregated vocabulary, then a
  tiny driver merge of ≤ k rows per block (same pattern as
  ``relational.top_revenue_orders`` / ``ann.brute_topk``) — no global sort
  of the vocabulary for a top-100.
- ``doc_term_freq`` — per-(doc, term) tf, fully vectorized: flatten the
  token list column, pair parent-doc indices with dictionary codes, one
  ``np.unique(return_counts=True)`` per block. No Python loop over rows or
  tokens.
- ``distinctive_terms`` — TF-IDF-flavored top-term-per-doc. Two passes:
  (1) document frequencies by summing per-block distinct (doc, term)
  partials — exact because a document never spans blocks; (2) tf ⋈ df via
  a hash join ON TERM (the scale path: the vocabulary of a 100 TB corpus
  does not fit in a broadcast map, but a key-partitioned join streams), a
  float64 ``tfidf = tf·ln(N/df)`` score column for users, and a
  DETERMINISTIC integer-ordered selection (tf DESC, df ASC, term ASC) so
  the result is reproducible in SQL independent of libm rounding.

Tokenization is ``\\S+`` runs (whitespace split), exactly DuckDB's
``regexp_extract_all(text, '\\S+')`` — the oracle contract used by
``stages/text.py`` too.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# Vocabulary sizes up to this many (term, df) rows are broadcast via
# ray.put instead of hash-shuffle-joined: ~2M rows ≈ tens of MB in plasma,
# shipped once per node and mapped zero-copy into every join task.
_BROADCAST_VOCAB_MAX = 2_000_000


def _flat_tokens(b: pa.Table, text_col: str):
    """(tokens, parent_doc_row_indices) for one block — ``\\S+`` runs.
    Splitting on ``\\s+`` yields empty-string artifacts at text edges;
    filtering those leaves exactly the ``\\S+`` matches."""
    toks = pc.split_pattern_regex(b[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep).combine_chunks(), \
        parent.filter(keep).to_numpy(zero_copy_only=False)


def term_counts(ds, text_col: str = "text"):
    """Global term frequencies → Dataset of (term: string, n: int64).

    Partial aggregation inside ``map_batches`` (one (term, n) row per
    distinct term per block); the groupby then sums partials — tokens
    themselves never shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(b, text_col)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = flat.dictionary_encode()
        counts = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))


def top_terms(ds, k: int = 100, text_col: str = "text") -> pa.Table:
    """Top ``k`` terms by (n DESC, term ASC) — deterministic under count
    ties. Returns an in-memory table (≤ k rows); the merge input is ≤ k
    rows per block of the aggregated vocabulary, never the vocabulary
    itself."""
    agg = term_counts(ds, text_col)

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("n", "descending"),
                                            ("term", "ascending")])[:k]
        return b.take(idx)

    parts = [t for t in agg.map_batches(local_topk, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"term": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                             ("term", "ascending")])[:k]
    return merged.take(idx)


def doc_term_freq(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-(doc, term) frequencies → Dataset of (doc_id, term, tf: int64).
    One vectorized ``np.unique`` over (parent-doc, term-code) pairs per
    block; documents with no tokens emit nothing (SQL unnest semantics)."""

    def per_block(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b, text_col)
        if len(flat) == 0:
            return pa.table({id_col: pa.array([], type=b[id_col].type),
                             "term": pa.array([], type=pa.string()),
                             "tf": pa.array([], type=pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = parent.astype(np.int64) * len(enc.dictionary) + codes
        upair, tf = np.unique(pair, return_counts=True)
        doc_rows = upair // len(enc.dictionary)
        term_codes = upair % len(enc.dictionary)
        return pa.table({
            id_col: pc.take(b[id_col], pa.array(doc_rows)),
            "term": pc.take(enc.dictionary, pa.array(term_codes)),
            "tf": pa.array(tf.astype(np.int64))})

    return ds.map_batches(per_block, batch_format="pyarrow")


def doc_frequencies(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Document frequencies → Dataset of (term, df: int64). Exact: each
    block contributes its distinct (doc, term) pairs once, and a document
    (one row) never spans blocks, so summing per-block partials is the
    global distinct-doc count per term."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b, text_col)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = parent.astype(np.int64) * len(enc.dictionary) + codes
        term_codes = np.unique(pair) % len(enc.dictionary)
        uterm, df = np.unique(term_codes, return_counts=True)
        return pa.table({"term": pc.take(enc.dictionary, pa.array(uterm)),
                         "df": pa.array(df.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df", alias_name="df"))


def distinctive_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                      n_parts: int = 64):
    """Most distinctive term per document → Dataset of
    (doc_id, term, tf, df, tfidf: float64).

    Selection order is (tf DESC, df ASC, term ASC) — the integer
    lexicographic proxy for tf·idf that is bit-reproducible in SQL (a
    float-score argmax would tie-break on libm rounding). The float64
    ``tfidf = tf · ln(N/df)`` column is still emitted for users.

    Scale shape: tf ⋈ df is a hash join ON TERM (both sides are Datasets;
    no driver-side vocabulary), then top-1 per doc inside coarse hash
    partitions of doc_id (vectorized ``pc.sort_indices`` + run-slice per
    partition — never one dispatch per document)."""
    import ray

    from .select import _hash_part_of

    n_docs = ds.count()
    tf = doc_term_freq(ds, id_col, text_col)
    df = doc_frequencies(ds, id_col, text_col)
    # doc_frequencies ends in a hash-shuffle groupby, which emits
    # SCHEMA-LESS empty blocks for empty hash partitions (more partitions
    # than distinct terms at high cpu counts); Dataset.join aborts on them
    # ("No match ... FieldRef.Name(term) on right side"). df is
    # vocab-sized, so materialize + drop-empties is cheap; tf is pure
    # map_batches output and needs no guard.
    from .dedup import _drop_empty_blocks
    df = _drop_empty_blocks(df.materialize())
    vocab_rows = df.count()
    if vocab_rows <= _BROADCAST_VOCAB_MAX:
        # small-side broadcast: ship the (term → df) table once via
        # ray.put, attach df to the fact side with a vectorized
        # pc.index_in + take per batch — no all-to-all shuffle at all
        # (measured 5.2 s shuffle join → sub-second at sf0.1/32 cpus).
        vt = pa.concat_tables(
            df.iter_batches(batch_size=None, batch_format="pyarrow")).combine_chunks()
        vref = ray.put(vt)

        def attach_df(b: pa.Table) -> pa.Table:
            v = ray.get(vref)
            pos = pc.index_in(b["term"], value_set=v["term"])
            good = pc.is_valid(pos)  # inner-join semantics
            b = b.filter(good)
            taken = pc.take(v["df"], pos.filter(good))
            return b.append_column("df", taken)

        joined = tf.map_batches(attach_df, batch_format="pyarrow")
    else:
        # huge-vocab fallback (100 TB crawls: unbounded distinct terms):
        # hash-shuffle join on term. Cap join partitions by cluster CPUs:
        # each hash-shuffle aggregator actor reserves 0.125 CPU, and an
        # aggregator fleet larger than the cluster starves the map side
        # (observed deadlock: 64 partitions on a 4-CPU session).
        cpus = int(ray.cluster_resources().get("CPU", 8))
        join_parts = max(2, min(n_parts, cpus * 2))
        joined = tf.join(df, join_type="inner", num_partitions=join_parts,
                         on=("term",))

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b[id_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        if "_part" in g.column_names:
            g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            (id_col, "ascending"), ("tf", "descending"),
            ("df", "ascending"), ("term", "ascending")])
        g = g.take(idx)
        doc_codes = g[id_col].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, doc_codes[1:] != doc_codes[:-1]])
        g = g.take(pa.array(starts))
        tf_v = g["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = g["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf_v * np.log(float(n_docs) / df_v)
        return g.append_column("tfidf", pa.array(score, type=pa.float64()))

    return joined.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   n_parts: int = 64):
    """Inverted index build → Dataset of (term, n_docs: int64,
    postings: string) where ``postings`` is the ascending comma-joined
    doc-id list — the classic search/retrieval index construction.

    Scale shape: each block contributes its DISTINCT (term, doc_id)
    pairs (raw tokens never shuffle; a document is one row so per-block
    distinct is globally distinct), pairs hash-shuffle ONCE on a coarse
    term partition, and each partition builds every posting list
    vectorized (one sort + run-slice + Arrow ``binary_join`` per
    partition — never one dispatch per term).

    Partitioning assumption (documented for 100 TB): one term's posting
    list fits in one partition's block. For crawl-scale stopword terms,
    segment postings by doc-id range (emit (term, segment) keys) before
    this stage; the synthetic corpus is far below that regime.
    """
    from .select import _hash_part_of

    def pairs(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b, text_col)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=b[id_col].type)})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(enc.dictionary)
        upair = np.unique(parent.astype(np.int64) * v + codes)
        return pa.table({
            "term": pc.take(enc.dictionary, pa.array(upair % v)),
            id_col: pc.take(b[id_col], pa.array(upair // v))})

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b["term"], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "n_docs": pa.array([], type=pa.int64()),
                             "postings": pa.array([], type=pa.string())})
        idx = pc.sort_indices(g, sort_keys=[("term", "ascending"),
                                            (id_col, "ascending")])
        g = g.take(idx)
        codes = g["term"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.r_[starts, len(codes)]
        ids_str = pc.cast(g[id_col], pa.string()).combine_chunks()
        if isinstance(ids_str, pa.ChunkedArray):
            ids_str = ids_str.combine_chunks()
        lst = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int64), type=pa.int64()).cast(pa.int32()),
            ids_str)
        return pa.table({
            "term": pc.take(g["term"], pa.array(starts)),
            "n_docs": pa.array((bounds[1:] - bounds[:-1]).astype(np.int64)),
            "postings": pc.binary_join(lst, ","),
        })

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def bigram_counts(ds, text_col: str = "text"):
    """Global bigram (adjacent-token-pair) frequencies → Dataset of
    (bigram: string, n: int64) — the n-gram LM statistics pass.

    Same combiner shape as :func:`term_counts`: bigrams are formed
    vectorized from the flat token buffer (adjacent positions with the
    same parent doc — a document never spans blocks, so per-block
    pairing is globally exact), counted per block via dictionary-encode
    + bincount, and only (bigram, n) partials shuffle."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b, text_col)
        empty = pa.table({"bigram": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if len(flat) < 2:
            return empty
        same = parent[1:] == parent[:-1]        # adjacent within one doc
        if not same.any():
            return empty
        left = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        right = flat.slice(1).filter(pa.array(same))
        bg = pc.binary_join_element_wise(left, right, " ")
        if isinstance(bg, pa.ChunkedArray):
            bg = bg.combine_chunks()
        enc = bg.dictionary_encode()
        counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                             minlength=len(enc.dictionary))
        return pa.table({"bigram": enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))


def lm_score_docs(ds, q: int = 1_000_000, text_col: str = "text",
                  id_col: str = "doc_id", min_count: int = 1):
    """CCNet-shaped bigram-LM document scoring (Wenzek et al. 2020:
    score every document under a language model learned from the corpus,
    so downstream filters can keep the head of the quality distribution).
    Exact-integer variant so the distributed machinery is SQL-checkable:
    the per-document score is

        lm_score = Σ_i  floor(q · C(w_i w_{i+1}) / C(w_i))

    over the doc's adjacent token pairs, where C(·) are GLOBAL corpus
    counts (unigram denominator = total occurrences of w_i, a
    backoff-free MLE; bigrams with corpus count < ``min_count`` are
    pruned to 0 — the CCNet vocabulary cut). Each addend is a pure
    function of global counts, so the int64 sum is associative and the
    result is partition-independent and bit-reproducible in SQL.

    Scale shape: ONE combined counting scan (unigram + bigram partials
    fold per block via dictionary-encode + bincount; only (gram, kind,
    n) rows shuffle — ~100× below token volume on natural text), the
    pruned count tables broadcast once via ``ray.put`` (vocab-bounded;
    at crawl scale ``min_count`` ≥ 2 is the standard LM-pruning knob
    that keeps this tens-of-GB → sub-GB), then a map-only scoring pass
    (searchsorted lookups + segment-sum; no shuffle touches document
    text). Returns (id_col, n_bigrams, lm_score) for every document.

    Raises if ``q × max(bigram count)`` would overflow int64 — at that
    corpus size lower ``q`` (the score is a ratio; precision, not
    range)."""
    import ray
    from ray.data.aggregate import Sum

    def gram_partials(b: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(b, text_col)
        out_g, out_k, out_n = [], [], []
        if len(flat) > 0:
            enc = flat.dictionary_encode()
            counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                                 minlength=len(enc.dictionary))
            out_g.append(enc.dictionary)
            out_k.append(np.zeros(len(enc.dictionary), dtype=np.int8))
            out_n.append(counts.astype(np.int64))
        if len(flat) >= 2:
            same = parent[1:] == parent[:-1]
            if same.any():
                m = pa.array(same)
                bg = pc.binary_join_element_wise(
                    flat.slice(0, len(flat) - 1).filter(m),
                    flat.slice(1).filter(m), " ")
                if isinstance(bg, pa.ChunkedArray):
                    bg = bg.combine_chunks()
                enc2 = bg.dictionary_encode()
                c2 = np.bincount(enc2.indices.to_numpy(zero_copy_only=False),
                                 minlength=len(enc2.dictionary))
                out_g.append(enc2.dictionary)
                out_k.append(np.ones(len(enc2.dictionary), dtype=np.int8))
                out_n.append(c2.astype(np.int64))
        if not out_g:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "kind": pa.array([], type=pa.int8()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({
            "gram": pa.concat_arrays([a.cast(pa.string()) for a in out_g]),
            "kind": pa.array(np.concatenate(out_k)),
            "n": pa.array(np.concatenate(out_n)),
        })

    counts = ds.map_batches(gram_partials, batch_format="pyarrow") \
        .groupby(["gram", "kind"]).aggregate(Sum("n", alias_name="n"))
    ct = pa.concat_tables(
        counts.iter_batches(batch_size=None, batch_format="pyarrow"))
    ct = ct.combine_chunks()
    kind = ct["kind"].to_numpy(zero_copy_only=False)
    ns = ct["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    uni_sel = np.flatnonzero(kind == 0)
    bi_sel = np.flatnonzero((kind == 1) & (ns >= min_count))
    uni_g = pc.take(ct["gram"], pa.array(uni_sel)).combine_chunks()
    uni_n = ns[uni_sel]
    bi_g = pc.take(ct["gram"], pa.array(bi_sel)).combine_chunks()
    bi_n = ns[bi_sel]
    if bi_n.size and int(bi_n.max()) > (2**63 - 1) // max(q, 1):
        raise ValueError(
            f"q={q} x max bigram count {int(bi_n.max())} overflows int64; "
            "lower q")
    ref = ray.put((uni_g, uni_n, bi_g, bi_n))

    def score(b: pa.Table) -> pa.Table:
        ug, un, bg_g, bg_n = ray.get(ref)
        flat, parent = _flat_tokens(b, text_col)
        n = b.num_rows
        n_bi = np.zeros(n, dtype=np.int64)
        tot = np.zeros(n, dtype=np.int64)
        if len(flat) >= 2:
            same = parent[1:] == parent[:-1]
            if same.any():
                m = pa.array(same)
                left = flat.slice(0, len(flat) - 1).filter(m)
                bg = pc.binary_join_element_wise(
                    left, flat.slice(1).filter(m), " ")
                pdoc = parent[:-1][same]
                # C(bigram): 0 where absent/pruned (hash lookup, not
                # object-compare searchsorted)
                pos = pc.fill_null(pc.index_in(bg, value_set=bg_g), -1) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                c2 = np.where(pos >= 0,
                              bg_n[np.clip(pos, 0, None)]
                              if len(bg_n) else 0, 0)
                # C(left unigram): present by construction (occurs here)
                upos = pc.index_in(left, value_set=ug) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                c1 = un[upos]
                addend = (q * c2.astype(np.int64)) // c1
                np.add.at(tot, pdoc, addend)
                np.add.at(n_bi, pdoc, 1)
        return pa.table({
            id_col: b[id_col],
            "n_bigrams": pa.array(n_bi),
            "lm_score": pa.array(tot),
        })

    return ds.map_batches(score, batch_format="pyarrow")
