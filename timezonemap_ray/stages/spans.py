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
