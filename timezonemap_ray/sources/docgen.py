"""Deterministic interleaved-span document generator.

The driver's testdata has a FLAT documents table; the engine's input shape
(BASELINE.json input_hint) is interleaved text+media+geo spans::

    documents(doc_id: string,
              spans: list<struct<kind, text, media_ref, offset>>)

This source derives that table deterministically from the flat testdata
``documents.parquet`` using PURE int64 arithmetic, so a DuckDB oracle can
reproduce the exact same float64 lat/lng values (bit-identical: the same
IEEE ops in the same order — see ``geo_point_sql_expr``).

Span layout per doc (n_geo = 1 + doc_id % 3):
  idx 0            : text span (the doc's own text)
  idx 1..n_geo     : geo spans, text = "{lat!r},{lng!r}"
  idx n_geo + 1    : media span (opaque binary ref)

Geo point formula (span j, 0-based; two independent integer hashes)::

  s   = (doc_id * 37 + j) * 2654435761 % 1000000007
  s2  = (doc_id * 37 + j) * 1779033703 % 999999937
  lat = (s  % 1300001) / 10000.0 - 65.0     # [-65.0, 65.0001)
  lng = (s2 % 3400001) / 10000.0 - 170.0    # [-170.0, 170.0001)

With ``hotspots=True`` a skew mixture is added (s % 5 == 0 → one of 4 dense
"urban" clusters) to exercise cell salting; this variant is used by the
bench harness, not the SQL-checked correctness queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MULT = np.int64(2654435761)
MOD = np.int64(1000000007)
MULT2 = np.int64(1779033703)
MOD2 = np.int64(999999937)
LAT_MOD = np.int64(1300001)
LNG_MOD = np.int64(3400001)

HOTSPOTS = [  # (lat, lng) cluster centers, deliberately in 4 different cells
    (40.71, -74.00), (51.50, -0.12), (35.68, 139.69), (-23.55, -46.63),
]


def geo_points_for(doc_ids: np.ndarray, j: int, hotspots: bool = False):
    """Vectorized lat/lng for geo span j of each doc (float64)."""
    d = doc_ids.astype(np.int64)
    s = (d * np.int64(37) + np.int64(j)) * MULT % MOD
    s2 = (d * np.int64(37) + np.int64(j)) * MULT2 % MOD2
    lat = (s % LAT_MOD).astype(np.float64) / 10000.0 - 65.0
    lng = (s2 % LNG_MOD).astype(np.float64) / 10000.0 - 170.0
    if hotspots:
        hot = (s % np.int64(5)) == 0
        ci = ((s // np.int64(5)) % np.int64(len(HOTSPOTS))).astype(np.int64)
        clat = np.array([h[0] for h in HOTSPOTS])[ci]
        clng = np.array([h[1] for h in HOTSPOTS])[ci]
        dlat = (s % np.int64(997)).astype(np.float64) / 10000.0 - 0.0498
        dlng = (s % np.int64(1009)).astype(np.float64) / 10000.0 - 0.0504
        lat = np.where(hot, clat + dlat, lat)
        lng = np.where(hot, clng + dlng, lng)
    return lat, lng


def geo_points_int_for(doc_ids: np.ndarray, j: np.ndarray):
    """INTEGER form of ``geo_points_for`` (hotspots off): exact int64
    quantized coordinates ``lat1e4 = s % 1300001 - 650000`` and
    ``lng1e4 = s2 % 3400001 - 1700000`` — the float form is
    ``lat1e4 / 1e4``.  Because both the engine and the DuckDB twin stay
    on this int64 lattice (``geo_points_int_sql_expr``), every spatial
    aggregate built on it is associative integer math, bit-reproducible
    under any partitioning.  ``j`` is a per-row 0-based geo index array."""
    d = doc_ids.astype(np.int64)
    jj = np.asarray(j, dtype=np.int64)
    s = (d * np.int64(37) + jj) * MULT % MOD
    s2 = (d * np.int64(37) + jj) * MULT2 % MOD2
    lat1e4 = s % LAT_MOD - np.int64(650000)
    lng1e4 = s2 % LNG_MOD - np.int64(1700000)
    return lat1e4, lng1e4


def geo_points_int_sql_expr(j: str = "j") -> tuple[str, str]:
    """DuckDB SQL (lat1e4, lng1e4) BIGINT expressions matching
    ``geo_points_int_for`` exactly."""
    s = f"(((doc_id * 37 + {j}) * 2654435761) % 1000000007)"
    s2 = f"(((doc_id * 37 + {j}) * 1779033703) % 999999937)"
    return (f"(({s} % 1300001) - 650000)",
            f"(({s2} % 3400001) - 1700000)")


def geo_point_sql_expr(j: str = "j") -> tuple[str, str]:
    """DuckDB SQL (lat, lng) expressions matching ``geo_points_for`` exactly
    (hotspots off). ``j`` is the SQL expression for the 0-based geo index."""
    s = f"(((doc_id * 37 + {j}) * 2654435761) % 1000000007)"
    s2 = f"(((doc_id * 37 + {j}) * 1779033703) % 999999937)"
    lat = f"(CAST({s} % 1300001 AS DOUBLE) / 10000.0 - 65.0)"
    lng = f"(CAST({s2} % 3400001 AS DOUBLE) / 10000.0 - 170.0)"
    return lat, lng


def spans_batch(batch: pa.Table, hotspots: bool = False) -> pa.Table:
    """Flat documents batch → interleaved span-documents batch (vectorized)."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    n = len(doc_ids)
    n_geo = (doc_ids % 3 + 1).astype(np.int64)
    n_spans = n_geo + 2  # text + geos + media

    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])

    kind = np.empty(total, dtype=object)
    text = np.empty(total, dtype=object)
    media = np.empty(total, dtype=object)
    offs = np.zeros(total, dtype=np.int32)

    # geo coords per (doc, j) — vectorized per j across all docs
    max_geo = int(n_geo.max()) if n else 0
    lat_by_j = {}
    lng_by_j = {}
    for j in range(max_geo):
        lat_by_j[j], lng_by_j[j] = geo_points_for(doc_ids, j, hotspots=hotspots)

    for i in range(n):
        base = offsets[i]
        kind[base] = "text"
        text[base] = texts[i]
        media[base] = ""
        offs[base] = 0
        g = int(n_geo[i])
        for j in range(g):
            k = base + 1 + j
            kind[k] = "geo"
            text[k] = f"{lat_by_j[j][i]!r},{lng_by_j[j][i]!r}"
            media[k] = ""
            offs[k] = np.int32(1 + j)
        kind[base + 1 + g] = "media"
        text[base + 1 + g] = ""
        media[base + 1 + g] = f"media://blob/{int(doc_ids[i])}"
        offs[base + 1 + g] = np.int32(1 + g)

    struct = pa.StructArray.from_arrays(
        [pa.array(kind, type=pa.string()), pa.array(text, type=pa.string()),
         pa.array(media, type=pa.string()), pa.array(offs, type=pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    return pa.table({
        "doc_id": pa.array([str(d) for d in doc_ids], type=pa.string()),
        "spans": spans,
    })


def span_documents(sf_dir: str, hotspots: bool = False, parallelism: int = -1):
    """Ray Dataset of interleaved span-documents for an sf dir."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lambda b: spans_batch(b, hotspots=hotspots),
                          batch_format="pyarrow")


def synthetic_points(n: int, hotspots: bool = True, parallelism: int | None = None):
    """Large synthetic point Dataset for the bench harness: ``n`` rows of
    (point_id, lat, lng), generated in parallel from ranges (no file IO).
    Blocks sized ~128k rows so downstream vectorized kernels see full
    batches (tiny blocks starve the PIP kernel)."""
    import ray.data as rd
    if parallelism is None:
        parallelism = max(8, min(512, n // 131072))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lng = geo_points_for(ids, 0, hotspots=hotspots)
        return pa.table({"point_id": pa.array(ids, type=pa.int64()),
                         "lat": pa.array(lat), "lng": pa.array(lng)})

    ds = rd.range(n, override_num_blocks=parallelism)
    return ds.map_batches(gen, batch_format="pyarrow")
