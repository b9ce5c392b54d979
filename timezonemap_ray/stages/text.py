"""Text-analysis stages over the documents table (SURVEY mandate: the
training-data operators a 100 TB pipeline needs, first-class alongside the
geo engine). All per-batch fns are vectorized (pyarrow.compute RE2 kernels /
numpy); the only per-row python is C-speed hashing (md5) where no columnar
kernel exists.

DuckDB-oracle compatibility notes: every numeric column an oracle checks is
computed with the same expression shape the SQL uses (same RE2 patterns via
``regexp_extract_all`` / ``string_split_regex``, same float64 op order), so
value hashes match bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = r"\S+"
PUNCT_PATTERN = r"[.,;:!?]"
STOPWORD_PATTERN = r"\b(the|a|of|and|in|to|is)\b"

# tiny per-language marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["big", "a"],  # synthetic-corpus markers
}


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens, n_chars): whitespace tokenization.
    Oracle: ``array_length(string_split_regex(trim(text), '\\s+'))``."""
    n_tokens = pc.count_substring_regex(batch[text_col], pattern=TOKEN_PATTERN)
    n_chars = pc.utf8_length(batch[text_col])
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "n_chars": pc.cast(n_chars, pa.int64()),
    })


def normalize_text(batch: pa.Table, text_col: str = "text",
                   out_col: str = "norm_text") -> pa.Table:
    """Canonical text normalization: lowercase, collapse whitespace runs
    to single spaces, trim the edges — the standard pre-dedup /
    pre-tokenize cleanup. Pure RE2/utf8 kernels, zero-copy in.
    Oracle: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    t = pc.replace_substring_regex(batch[text_col], pattern=r"\s+",
                                   replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    t = pc.utf8_lower(t)
    return pa.table({"doc_id": batch["doc_id"], out_col: t})


# Default redaction rules: PII-shaped patterns (email / long digit runs)
# plus a content blocklist seam. All RE2; Arrow and DuckDB both compile
# these with RE2 so the oracle is bit-identical (verified: \b, alternation
# and 'g'-flag replace agree).
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{7,}\b", "[NUMBER]"),
)


def redact_text(batch: pa.Table, patterns=REDACT_PATTERNS,
                text_col: str = "text") -> pa.Table:
    """PII / blocklist redaction: mask every match of each (pattern,
    replacement) rule and count redactions per document — the standard
    pre-release scrub in a training-data pipeline. Pure RE2 kernels
    (one replace + one count pass per rule), zero Python per row; rules
    apply in order so a later pattern sees earlier replacements, exactly
    like chained ``regexp_replace(.., 'g')`` calls in SQL.
    """
    t = batch[text_col]
    n_red = None
    for pat, repl in patterns:
        c = pc.cast(pc.count_substring_regex(t, pattern=pat), pa.int64())
        n_red = c if n_red is None else pc.add(n_red, c)
        t = pc.replace_substring_regex(t, pattern=pat, replacement=repl)
    if n_red is None:
        n_red = pa.nulls(batch.num_rows, pa.int64())
        n_red = pc.fill_null(n_red, 0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "clean_text": t,
        "n_redacted": n_red,
    })


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document quality features + a combined score.

    score = stop_count/n_tokens + punct_count/n_chars  (float64, this op
    order), n_tokens/n_chars guarded to >= 1. Oracle mirrors with
    ``regexp_extract_all`` counts.
    """
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(zero_copy_only=False)
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern=TOKEN_PATTERN),
                       pa.int64()).to_numpy(zero_copy_only=False)
    punct = pc.cast(pc.count_substring_regex(text, pattern=PUNCT_PATTERN),
                    pa.int64()).to_numpy(zero_copy_only=False)
    stop = pc.cast(pc.count_substring_regex(text, pattern=STOPWORD_PATTERN),
                   pa.int64()).to_numpy(zero_copy_only=False)
    tok_d = np.maximum(n_tokens, 1).astype(np.float64)
    chr_d = np.maximum(n_chars, 1).astype(np.float64)
    score = stop.astype(np.float64) / tok_d + punct.astype(np.float64) / chr_d
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "punct_count": pa.array(punct, type=pa.int64()),
        "stop_count": pa.array(stop, type=pa.int64()),
        "quality": pa.array(score, type=pa.float64()),
    })


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-word language heuristic → (doc_id, lang_pred, lang_score).
    Deterministic; ties resolve in LANG_MARKERS key order."""
    langs = list(LANG_MARKERS)
    counts = []
    for lg in langs:
        pat = r"\b(" + "|".join(LANG_MARKERS[lg]) + r")\b"
        c = pc.cast(pc.count_substring_regex(batch[text_col], pattern=pat),
                    pa.int64()).to_numpy(zero_copy_only=False)
        counts.append(c)
    mat = np.stack(counts, axis=1)  # (n, n_langs)
    best = np.argmax(mat, axis=1)   # first max wins → deterministic
    n = pc.cast(pc.count_substring_regex(batch[text_col], pattern=TOKEN_PATTERN),
                pa.int64()).to_numpy(zero_copy_only=False)
    score = mat[np.arange(len(best)), best] / np.maximum(n, 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array([langs[i] for i in best], type=pa.string()),
        "lang_score": pa.array(score, type=pa.float64()),
    })


def token_diversity(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition / diversity quality signal → (doc_id, n_tokens,
    n_distinct, diversity: float64 = n_distinct/max(n_tokens,1)).

    Near-zero diversity flags boilerplate & generated spam — a standard
    pre-training corpus filter. Fully vectorized: flatten the token list
    column once, pair parent-doc indices with dictionary codes, one
    ``np.unique`` per block (same kernel shape as ``terms.doc_term_freq``
    — no Python loop over rows or tokens).
    Oracle: ``len(list_distinct(regexp_extract_all(text, '\\S+')))``."""
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep).combine_chunks()
    parent = parent.filter(keep).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = batch.num_rows
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = parent * len(enc.dictionary) + codes
        upair = np.unique(pair)
        n_distinct = np.bincount(upair // len(enc.dictionary),
                                 minlength=n).astype(np.int64)
    else:
        n_distinct = np.zeros(n, dtype=np.int64)
    div = n_distinct / np.maximum(n_tokens, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "n_distinct": pa.array(n_distinct, type=pa.int64()),
        "diversity": pa.array(div, type=pa.float64()),
    })


def repetition_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals per document → (doc_id,
    n_tokens, top_token_frac, n_bigrams, dup_bigram_frac,
    top_bigram_frac), all exact:

    - ``top_token_frac``  = count of the most frequent token / n_tokens
    - ``dup_bigram_frac`` = (n_bigrams − distinct bigrams) / n_bigrams
    - ``top_bigram_frac`` = count of the most frequent bigram / n_bigrams

    High values flag boilerplate / template spam (Rae et al., Gopher,
    §A1.1 repetition filters — public method). Fully vectorized: one
    token flatten, dictionary codes, np.unique over (doc, gram) keys —
    the same kernel shape as :func:`token_diversity`; no Python loop
    over rows or tokens. Fractions are IEEE divisions of exact ints, so
    the SQL twin reproduces the float64 bits."""
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep).combine_chunks()
    parent = parent.filter(keep).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = batch.num_rows
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    top_tok = np.zeros(n, dtype=np.int64)
    n_bigrams = np.zeros(n, dtype=np.int64)
    n_dist_bg = np.zeros(n, dtype=np.int64)
    top_bg = np.zeros(n, dtype=np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(enc.dictionary)
        # per-(doc, token) counts → per-doc max
        ukey, cnt = np.unique(parent * v + codes, return_counts=True)
        np.maximum.at(top_tok, ukey // v, cnt)
        # consecutive same-doc positions form bigrams
        adj = parent[:-1] == parent[1:]
        if adj.any():
            bp = parent[:-1][adj]
            pair = codes[:-1][adj] * v + codes[1:][adj]
            # re-encode pair ids densely so (doc, pair) keys stay small
            upair, pcodes = np.unique(pair, return_inverse=True)
            v2 = len(upair)
            bkey, bcnt = np.unique(bp * v2 + pcodes, return_counts=True)
            bdoc = bkey // v2
            n_bigrams = np.bincount(bp, minlength=n).astype(np.int64)
            n_dist_bg = np.bincount(bdoc, minlength=n).astype(np.int64)
            np.maximum.at(top_bg, bdoc, bcnt)
    denom_t = np.maximum(n_tokens, 1).astype(np.float64)
    denom_b = np.maximum(n_bigrams, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "top_token_frac": pa.array(top_tok / denom_t, type=pa.float64()),
        "n_bigrams": pa.array(n_bigrams, type=pa.int64()),
        "dup_bigram_frac": pa.array((n_bigrams - n_dist_bg) / denom_b,
                                    type=pa.float64()),
        "top_bigram_frac": pa.array(top_bg / denom_b, type=pa.float64()),
    })


def md5_digest(batch: pa.Table, text_col: str = "text",
               out_col: str = "digest") -> pa.Table:
    """Content digest column (md5 hex — matches DuckDB ``md5(text)``)."""
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
               for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(digests, type=pa.string()))


ROLL_BASE = np.uint64(1099511628211)


def rolling_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, fingerprint): FNV-style rolling hash over the utf-8 bytes —
    the document-fingerprint primitive (vectorized via numpy on the byte
    buffer; not SQL-expressible → rows-only check)."""
    fps = []
    with np.errstate(over="ignore"):
        for t in batch[text_col].to_pylist():
            if t is None:
                fps.append(0)
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            # polynomial rolling hash mod 2^64 (wrapping uint64 arithmetic),
            # fully vectorized: h = sum(b[i] * BASE^(n-1-i))
            powers = np.power(ROLL_BASE,
                              np.arange(b.size - 1, -1, -1, dtype=np.uint64))
            fps.append(int((b * powers).sum(dtype=np.uint64)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(np.array(fps, dtype=np.uint64), type=pa.uint64()),
    })


_MIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _MIX_C1
        x = (x ^ (x >> np.uint64(27))) * _MIX_C2
        return x ^ (x >> np.uint64(31))


def token_hashes(text: str, shingle: int = 3, pad: bool = True,
                 token_cache: dict | None = None,
                 hasher=None) -> np.ndarray:
    """Word-shingle hash set for minhash/jaccard (uint64, deduped).

    Each TOKEN is hashed once (blake2b, optionally memoized across calls via
    ``token_cache`` — an actor-held dict); shingle hashes are then a
    vectorized positional splitmix64 fold over the token-hash windows.
    Tokens contain no whitespace, so equal shingle hashes ⟺ equal shingle
    strings (up to 64-bit collisions) — the same equality semantics as
    hashing the joined string, at a fraction of the hashlib calls.

    ``pad=False``: documents with fewer than ``shingle`` tokens get an EMPTY
    set (used by the exact n-gram Jaccard op so its DuckDB oracle needs no
    NUL-padding emulation); default pads with \\x00 tokens as before.
    """
    toks = text.split()
    if len(toks) < shingle:
        if not pad:
            return np.empty(0, dtype=np.uint64)
        toks = toks + ["\x00"] * (shingle - len(toks))
    cache = token_cache if token_cache is not None else {}
    hfn = hasher or hash_u64
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = hfn(t)
            cache[t] = h
        th[i] = h
    n = len(toks) - shingle + 1
    hs = np.full(n, np.uint64(0x9E3779B97F4A7C15))
    for j in range(shingle):  # positional fold keeps word ORDER significant
        hs = _splitmix64(hs ^ th[j:j + n])
    return np.unique(hs)


def hash_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(), "little")


def hash_u64_md5(s: str) -> int:
    """64-bit token hash DuckDB can recompute: the first 16 hex digits of
    md5, read big-endian (SQL: positional hex parse of ``md5(w)``).
    Slightly slower than blake2b — used by the oracle-checkable md5 mode
    of the minhash family; dispersion is equivalent."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def chunk_documents(batch: pa.Table, chunk: int = 50, stride: int = 40,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Context-window chunking for training pipelines → one row per chunk:
    (<id_col>, chunk_idx, chunk_text, n_tokens).

    Chunks are token windows ``[i·stride, i·stride + chunk)`` over the
    ``\\S+`` tokens, ``n_chunks = ceil(max(n−chunk, 0)/stride) + 1`` (every
    token covered; trailing window may be short; ``chunk > stride`` ⇒
    overlap). ``chunk_text`` is the window joined with single spaces
    (normalized whitespace — the SQL-reproducible contract:
    ``array_to_string(list_slice(...), ' ')``). Docs with no tokens emit
    nothing (unnest semantics).

    Fully vectorized: one regex split, flatten once, chunk windows become
    a ``ListArray`` view over the flat token buffer (offset arithmetic,
    no copies), joined by the ``binary_join`` kernel — no Python loop
    over docs, tokens or chunks."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep).combine_chunks()
    parent = pc.list_parent_indices(toks).filter(keep) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = batch.num_rows
    nt = np.bincount(parent, minlength=n_rows).astype(np.int64)
    doc_start = np.r_[0, np.cumsum(nt)]  # flat offset of each doc's tokens
    n_chunks = np.where(
        nt > 0, np.ceil(np.maximum(nt - chunk, 0) / stride).astype(np.int64)
        + 1, 0)
    doc_of_chunk = np.repeat(np.arange(n_rows), n_chunks)
    # chunk_idx within each doc: global arange minus each doc's first slot
    first_slot = np.r_[0, np.cumsum(n_chunks)][:-1]
    cidx = np.arange(doc_of_chunk.size) - first_slot[doc_of_chunk]
    starts = doc_start[doc_of_chunk] + cidx * stride
    ends = np.minimum(starts + chunk, doc_start[doc_of_chunk]
                      + nt[doc_of_chunk])
    offsets = np.empty(doc_of_chunk.size + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(ends - starts, out=offsets[1:])
    lens = ends - starts
    total = int(offsets[-1]) if doc_of_chunk.size else 0
    # flat gather = repeat(starts) + position-within-window, no per-chunk loop
    gather = (np.repeat(starts, lens)
              + (np.arange(total) - np.repeat(offsets[:-1], lens))) \
        if total else np.empty(0, dtype=np.int64)
    windows = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        flat.take(pa.array(gather)))
    return pa.table({
        id_col: pc.take(batch[id_col], pa.array(doc_of_chunk)),
        "chunk_idx": pa.array(cidx),
        "chunk_text": pc.binary_join(windows, " "),
        "n_tokens": pa.array((ends - starts).astype(np.int64))})


def pack_chunks_docwise(batch: pa.Table, capacity: int = 256,
                        len_col: str = "n_tokens",
                        id_col: str = "doc_id") -> pa.Table:
    """DOC-WISE next-fit packing: each document's chunks (in chunk order)
    fill ``capacity``-token bins without crossing document boundaries —
    the packing policy long-context pipelines use when attention must not
    mix documents. Adds (pack_id, pack_pos), both PER DOCUMENT.

    Unlike the block-local FFD of :func:`pack_sequences`, this is a pure
    per-row-group sequential recurrence — deterministic for ANY
    partitioning that keeps a doc's chunks together (chunking emits them
    that way), so a recursive-CTE SQL twin reproduces it bit-for-bit
    (``oracle_sql['pack_chunks_docwise']``). An oversized chunk occupies
    a singleton bin. O(chunks) single pass.

    SAME-BATCH REQUIREMENT: a document's chunks must all arrive in ONE
    batch — a doc split across two map_batches blocks restarts pack_id
    at 0 mid-document with no error. FUSE this with the chunker in a
    single batch fn (``chunk_documents(b)`` then ``pack_chunks_docwise``
    on its output, as the driver query does); do NOT apply it standalone
    over a pre-chunked Dataset whose block boundaries Ray controls. For
    a shuffled input, co-locate first (``_coarse_groupby`` on id_col)."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("pack_id",
                                   pa.array([], type=pa.int64())) \
                    .append_column("pack_pos",
                                   pa.array([], type=pa.int64()))
    lens = batch[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    pack_id = np.empty(n, dtype=np.int64)
    pack_pos = np.empty(n, dtype=np.int64)
    cur_doc, cur_pack, cur_pos, fill = None, 0, 0, 0
    for i in range(n):
        if ids[i] != cur_doc:
            cur_doc, cur_pack, cur_pos, fill = ids[i], 0, 0, int(lens[i])
        elif fill + lens[i] <= capacity:
            fill += int(lens[i])
            cur_pos += 1
        else:
            cur_pack += 1
            cur_pos = 0
            fill = int(lens[i])
        pack_id[i] = cur_pack
        pack_pos[i] = cur_pos
    return batch.append_column("pack_id", pa.array(pack_id)) \
                .append_column("pack_pos", pa.array(pack_pos))


def pack_sequences(batch: pa.Table, capacity: int = 512,
                   len_col: str = "n_tokens") -> pa.Table:
    """Sample packing: first-fit-decreasing bin packing of chunks into
    fixed ``capacity``-token training sequences → adds (pack_id: int64,
    pack_pos: int64 slot within the sequence).

    Packing is BLOCK-LOCAL by design — at 100 TB, a global packing would
    serialize the corpus through one solver for at most a ~1% fill-ratio
    gain; per-block FFD on ≥ thousands of chunks is within a few percent
    of optimal (classic 11/9·OPT+1 bound) and keeps the op streaming and
    deterministic (ties broken by input order via stable sort). Items
    longer than ``capacity`` get a singleton bin (never split here —
    chunking upstream owns length control).

    First-fit runs on a max-segment-tree over bin remaining capacities
    (leftmost bin with room, O(log bins) per item — the naive scan is
    quadratic and measured 93 s on a 100k-chunk block).

    ``pack_id`` is content-derived (hash of the bin's first item + the
    block's length multiset) so ids are stable and safe for a global
    groupby when (doc_id, chunk_idx) columns are present; without them,
    distinct blocks with identical length multisets can collide."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column("pack_id",
                                   pa.array([], type=pa.int64())) \
                    .append_column("pack_pos",
                                   pa.array([], type=pa.int64()))
    lens = batch[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-lens, kind="stable")  # FFD: largest first
    bin_of = np.empty(n, dtype=np.int64)
    pos_of = np.empty(n, dtype=np.int64)
    # segment tree over bin slots: tree[i] = max remaining capacity in the
    # subtree; query = LEFTMOST bin with remaining >= need
    size = 1
    while size < n:
        size <<= 1
    tree = np.full(2 * size, -1, dtype=np.int64)  # -1 = bin not open yet
    counts = np.zeros(n, dtype=np.int64)
    n_bins = 0

    def tree_set(i: int, v: int):
        i += size
        tree[i] = v
        i >>= 1
        while i:
            tree[i] = tree[2 * i] if tree[2 * i] >= tree[2 * i + 1] \
                else tree[2 * i + 1]
            i >>= 1

    for row in order:
        ln = int(lens[row])
        if tree[1] >= ln:  # descend to the leftmost fitting bin
            i = 1
            while i < size:
                i = 2 * i if tree[2 * i] >= ln else 2 * i + 1
            b = i - size
            bin_of[row] = b
            pos_of[row] = counts[b]
            counts[b] += 1
            tree_set(b, int(tree[i]) - ln)
        else:
            b = n_bins
            n_bins += 1
            bin_of[row] = b
            pos_of[row] = 0
            counts[b] = 1
            tree_set(b, max(capacity - ln, 0))
    counts = counts[:n_bins]
    # globally-usable pack ids: hash the bin's FIRST item (pack_pos 0)
    # plus a block-content fold — block-local counters alone would collide
    # across blocks in any downstream global groupby
    first_rows = np.empty(n_bins, dtype=np.int64)
    first_rows[bin_of[pos_of == 0]] = np.flatnonzero(pos_of == 0)
    block_salt = np.uint64(0)
    with np.errstate(over="ignore"):
        for v in _splitmix64(lens.astype(np.uint64)):
            block_salt = block_salt * np.uint64(1_000_003) ^ v
        seed = (lens[first_rows].astype(np.uint64)
                * np.uint64(1_000_003)
                + np.arange(n_bins, dtype=np.uint64)) ^ block_salt
        if "doc_id" in batch.column_names:
            d = batch["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            seed = seed * np.uint64(1_000_003) + d[first_rows]
        if "chunk_idx" in batch.column_names:
            c = batch["chunk_idx"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            seed = seed * np.uint64(1_000_003) + c[first_rows]
    gids = (_splitmix64(seed) >> np.uint64(1)).astype(np.int64)  # ≥ 0
    return batch.append_column("pack_id", pa.array(gids[bin_of])) \
                .append_column("pack_pos", pa.array(pos_of))


MASK_TOKEN = "<mask>"
_MASK_MIX = 100003  # position mixer, coprime with SAMPLE_MOD


def mask_tokens(batch: pa.Table, rate_bp: int = 1500,
                text_col: str = "text") -> pa.Table:
    """Deterministic token masking (MLM/T5-style corruption): token ``i``
    (1-based) of document ``d`` masks iff

        ((((d mod M)·100003 + i) mod M)·SAMPLE_MULT mod M) mod 10000 < rate

    — the stateless sample_hash scheme keyed by (doc, position), so the
    mask pattern is reproducible across engines/retries and expressible
    in SQL (indexed list lambdas). Output text is tokens joined by single
    spaces (the same canonicalization the SQL ``array_to_string`` twin
    applies). Fully vectorized: one flat-token pass, one numpy hash, one
    ListArray rebuild + ``binary_join``."""
    from .terms import _flat_tokens

    from ..stages.select import SAMPLE_MOD, SAMPLE_MULT, SAMPLE_SPACE

    flat, parent = _flat_tokens(batch, text_col)
    n_rows = batch.num_rows
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(flat) == 0:
        valid = pc.is_valid(batch[text_col])
        texts = pc.if_else(valid, pa.array([""] * n_rows),
                           pa.scalar(None, pa.string()))
        zeros = pc.if_else(valid,
                           pa.array(np.zeros(n_rows, dtype=np.int64)),
                           pa.scalar(None, pa.int64()))
        return pa.table({"doc_id": batch["doc_id"],
                         "masked_text": texts, "n_masked": zeros})
    counts = np.bincount(parent, minlength=n_rows)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = (np.arange(len(flat), dtype=np.int64)
           - starts[parent] + 1)                       # 1-based in-doc
    M = np.int64(SAMPLE_MOD)
    d = ((doc_ids[parent] % M) + M) % M                # SQL-sign parity
    x = (d * np.int64(_MASK_MIX) + pos) % M
    from .select import _hash_bp
    masked = _hash_bp(x) < rate_bp
    toks = pc.if_else(pa.array(masked), pa.scalar(MASK_TOKEN), flat)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), toks)
    text_out = pc.binary_join(lst, " ")
    n_masked = np.bincount(parent[masked], minlength=n_rows)
    # null text → null outputs (SQL: regexp_extract_all(NULL) is NULL)
    valid = pc.is_valid(batch[text_col])
    text_out = pc.if_else(valid, text_out, pa.scalar(None, pa.string()))
    n_out = pc.if_else(valid, pa.array(n_masked.astype(np.int64)),
                       pa.scalar(None, pa.int64()))
    return pa.table({
        "doc_id": batch["doc_id"],
        "masked_text": text_out,
        "n_masked": n_out,
    })


def mask_sql_pred(doc_col: str, idx: str, rate_bp: int) -> str:
    """The SQL predicate matching ``mask_tokens`` (same negative-id
    renormalization as the sample family)."""
    from ..stages.select import SAMPLE_MOD, SAMPLE_MULT, SAMPLE_SPACE
    m = SAMPLE_MOD
    return (f"(((((({doc_col} % {m}) + {m}) % {m}) * {_MASK_MIX} + {idx})"
            f" % {m} * {SAMPLE_MULT}) % {m}) % {SAMPLE_SPACE} < {rate_bp}")


def feature_hash_counts(batch: pa.Table, dim: int = 256,
                        text_col: str = "text",
                        out_col: str = "counts",
                        hash_fn: str = "blake2b",
                        signed: bool = True,
                        id_col: str = "doc_id") -> pa.Table:
    """Hashing-trick document vectors as RAW SIGNED INTEGER COUNTS (no
    normalization): token hash → splitmix64 → bucket ``h % dim``, sign
    bit 63, ±1 per OCCURRENCE. The integer form exists for exactness:
    inner products of int64 count vectors are associative integer sums, so
    a MIPS top-k over them is bit-reproducible and SQL-checkable
    (``hash_fn="md5"`` makes the token hash DuckDB-recomputable; see
    ``oracle_sql['docs_hash_embed_mips_topk']``). The float cosine
    production path is :func:`feature_hash_vectors`.

    ``signed=False`` drops the sign bit (+1 per occurrence always):
    the vector is then a hashed bag-of-words MULTINOMIAL count — the
    nonnegative form distribution-ratio selection needs
    (``select.target_selection_int``)."""
    from .terms import _flat_tokens

    hfn = hash_u64_md5 if hash_fn == "md5" else hash_u64
    flat, parent = _flat_tokens(batch, text_col)
    n_rows = batch.num_rows
    out = np.zeros((n_rows, dim), dtype=np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_hashes = np.fromiter(
            (hfn(tok) for tok in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        hh = _splitmix64(dict_hashes)
        buckets = (hh % np.uint64(dim)).astype(np.int64)
        if signed:
            signs = np.where((hh >> np.uint64(63)).astype(bool), -1, 1) \
                .astype(np.int64)
            np.add.at(out, (parent, buckets[codes]), signs[codes])
        else:
            # unsigned: the constant weight needs no sign table/gather
            np.add.at(out, (parent, buckets[codes]), 1)
    flat_vals = pa.array(out.reshape(-1))
    emb = pa.FixedSizeListArray.from_arrays(flat_vals, dim)
    return pa.table({id_col: batch[id_col], out_col: emb})


def feature_hash_vectors(batch: pa.Table, dim: int = 256,
                         text_col: str = "text",
                         out_col: str = "embedding") -> pa.Table:
    """Feature-hashing (hashing-trick) document vectors: each token's
    64-bit hash picks a bucket (``h % dim``) and a deterministic sign
    (bit 63), accumulated then L2-normalized — the classic scalable
    text→vector bridge (no vocabulary, no training, merge-free). The
    output ``list<float>`` column is drop-in for the ANN / PQ / kmeans /
    PCA stages, so "hash-TF vectors → cosine near-dup / top-k" composes
    from existing operators.

    Fully vectorized per block: one flat-token pass, one md5-free numpy
    hash (splitmix64 over token dictionary codes is NOT content-stable
    across blocks — so hash the token BYTES via the FNV-1a fold below,
    C-speed blake2b via ``hash_u64`` over the dictionary only: each
    distinct token hashes once per block, not once per occurrence)."""
    from .terms import _flat_tokens

    flat, parent = _flat_tokens(batch, text_col)
    n_rows = batch.num_rows
    out = np.zeros((n_rows, dim), dtype=np.float64)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # content-stable 64-bit hash per DISTINCT token (C-speed blake2b
        # via the shared hash_u64 helper — once per dictionary entry,
        # not per occurrence)
        dict_hashes = np.fromiter(
            (hash_u64(tok) for tok in enc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(enc.dictionary))
        hh = _splitmix64(dict_hashes)
        buckets = (hh % np.uint64(dim)).astype(np.int64)
        signs = np.where((hh >> np.uint64(63)).astype(bool), -1.0, 1.0)
        np.add.at(out, (parent, buckets[codes]), signs[codes])
    norms = np.linalg.norm(out, axis=1)
    norms[norms == 0] = 1.0
    out = out / norms[:, None]
    flat_vals = pa.array(out.reshape(-1).astype(np.float32))
    emb = pa.FixedSizeListArray.from_arrays(flat_vals, dim)
    return pa.table({"doc_id": batch["doc_id"], out_col: emb})
