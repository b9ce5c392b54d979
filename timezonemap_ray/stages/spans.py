"""Span extraction — documents(doc_id, spans) → geo point rows.

Input shape (BASELINE.json input_hint / FIXTURES.md §1)::

    documents(doc_id: string,
              spans: list<struct<kind:string, text:string,
                                 media_ref:string, offset:int32>>)

``explode_spans`` flat-maps each document into one row per span, carrying
``(doc_id, span_idx, kind, text, media_ref, offset)`` — span_idx preserves
in-document order so the per-row span-sequence invariant
``(kind, text, media_ref, order)`` is checkable downstream.

``parse_geo_spans`` keeps rows with kind=="geo" and parses text "lat,lng"
into float64 ``lat``/``lng`` columns. All pyarrow.compute — no Python row
loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_spans(batch: pa.Table, doc_id_col: str = "doc_id",
                  spans_col: str = "spans") -> pa.Table:
    spans = batch[spans_col]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    # span_idx = position within the parent list
    import numpy as np
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    span_idx = np.arange(len(flat), dtype=np.int64)
    # offsets may not start at 0 for sliced arrays; flat indexing is relative
    starts = offsets[parent.to_numpy(zero_copy_only=False)] - offsets[0]
    span_idx = (span_idx - starts).astype(np.int32)
    cols = {
        doc_id_col: batch[doc_id_col].take(parent),
        "span_idx": pa.array(span_idx, type=pa.int32()),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    return pa.table(cols)


_GEO_RE = (r"^\s*(?P<glat>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s*,"
           r"\s*(?P<glng>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)\s*$")


def parse_geo_spans(batch: pa.Table, kind_col: str = "kind",
                    text_col: str = "text") -> pa.Table:
    """Filter to geo spans and parse "lat,lng" → float64 columns.

    Malformed span text NEVER throws (engine rule: no per-row exceptions
    mid-pipeline at corpus scale): non-matching rows get null lat/lng and
    ``parse_error=true``. Parsing is one RE2 ``extract_regex`` pass.
    """
    geo = batch.filter(pc.equal(batch[kind_col], "geo"))
    m = pc.extract_regex(geo[text_col], _GEO_RE)
    lat = pc.cast(pc.struct_field(m, "glat"), pa.float64())
    lng = pc.cast(pc.struct_field(m, "glng"), pa.float64())
    geo = geo.append_column("lat", lat)
    geo = geo.append_column("lng", lng)
    return geo.append_column("parse_error", pc.is_null(lat))


def extract_geo_points(batch: pa.Table) -> pa.Table:
    """Composed explode + parse, the flagship pipeline's front-end."""
    return parse_geo_spans(explode_spans(batch))


def merge_spans(ds, id_col: str = "doc_id", start_col: str = "s",
                end_col: str = "e", n_parts: int = 64):
    """Coalesce overlapping/touching [start, end) intervals per document
    (gaps-and-islands) → (doc_id, span_start, span_end, n_windows) — the
    step that turns window-level duplicate hits into maximal duplicated
    REGIONS for surgical span removal.

    One coarse hash shuffle on the doc id (a doc's intervals co-locate),
    then per partition: one vectorized sort + per-doc running-max scan
    (break where start > running max end), segment-reduce min/max/count.
    All int64 — bit-stable vs the SQL window-function twin."""
    import numpy as np

    from .select import _hash_part_of

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_part", pa.array(_hash_part_of(b[id_col], n_parts)))

    def per_part(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type if id_col in g.column_names \
            else pa.int64()
        empty = pa.table({
            id_col: pa.array([], type=id_type),
            "span_start": pa.array([], type=pa.int64()),
            "span_end": pa.array([], type=pa.int64()),
            "n_windows": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            (id_col, "ascending"), (start_col, "ascending"),
            (end_col, "ascending")])
        g = g.take(idx)
        d = g[id_col].to_numpy(zero_copy_only=False)
        s = g[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = g[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        doc_start = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(doc_start)
        # vectorized SEGMENTED running max: bias each doc's ends by a
        # distinct large base so the global cummax never crosses docs.
        # The shift adapts to the data (e ≥ 0); if docs × range can't
        # fit int64 (≥ ~4M docs in one partition with huge offsets),
        # fall back to the per-doc scan rather than silently overflow.
        run_id = np.cumsum(doc_start) - 1
        bits = max(int(e.max()).bit_length(), 1) + 1
        n_runs = int(run_id[-1]) + 1
        if (n_runs << bits) < (1 << 62):
            base = run_id.astype(np.int64) << np.int64(bits)
            cm = np.maximum.accumulate(e + base) - base
        else:
            cm = e.copy()
            bounds = np.r_[starts, n]
            for a, b_ in zip(bounds[:-1], bounds[1:]):
                cm[a:b_] = np.maximum.accumulate(e[a:b_])
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[1:] = cm[:-1]
        prev_max[starts] = np.int64(-1)
        brk = (s > prev_max) | doc_start
        grp = np.cumsum(brk) - 1
        n_grp = int(grp[-1]) + 1
        out_s = np.full(n_grp, np.iinfo(np.int64).max, dtype=np.int64)
        out_e = np.zeros(n_grp, dtype=np.int64)
        np.minimum.at(out_s, grp, s)
        np.maximum.at(out_e, grp, e)
        cnt = np.bincount(grp, minlength=n_grp).astype(np.int64)
        first_rows = np.flatnonzero(brk)
        return pa.table({
            id_col: pc.take(g[id_col], pa.array(first_rows)),
            "span_start": pa.array(out_s),
            "span_end": pa.array(out_e),
            "n_windows": pa.array(cnt)})

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pyarrow")
