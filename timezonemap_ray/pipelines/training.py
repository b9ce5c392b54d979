"""Composite training-data pipeline — the "everything composed" flow:

    documents
      → content digest → exact dedup (big-big hash join against the
        keeper set — no broadcast of the digest space)
      → quality filter (vectorized RE2 features)
      → token counting
      → geo enrichment (first geo point per doc → broadcast PIP zone join)
      → curated corpus rows

Every stage streams; the only wide ops are the dedup groupby and the
keeper hash join. The whole pipeline has an exact DuckDB oracle
(``sql_training_pipeline``) — the geo coordinates derive from doc_id by the
SQL-reproducible integer formula (sources/docgen.py) and the zone
predicates are generated from the same conformance world the engine
indexes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUALITY_MIN = 0.05


def curated_corpus(sf_dir: str, engine, quality_min: float = QUALITY_MIN):
    """→ Dataset (doc_id, n_tokens, quality, lat, lng, zone_id, matched)."""
    import ray.data as rd
    from ray.data.aggregate import Min
    from ..sources.docgen import geo_points_for
    from ..stages.join import hash_join
    from ..stages.text import md5_digest, quality_score

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    digested = docs.map_batches(md5_digest, batch_format="pyarrow")

    # exact dedup: keeper = min doc_id per digest; big-big hash semi-join
    keepers = digested.groupby("digest").aggregate(
        Min("doc_id", alias_name="keep_id"))
    deduped = hash_join(digested, keepers, on="digest").map_batches(
        lambda b: b.filter(pc.equal(b["doc_id"], b["keep_id"])),
        batch_format="pyarrow")

    def enrich(b: pa.Table) -> pa.Table:
        q = quality_score(b)
        keep = pc.greater_equal(q["quality"], pa.scalar(quality_min))
        q = q.filter(keep)
        ids = q["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lng = geo_points_for(ids, 0)  # first geo span (j=0)
        return pa.table({
            "doc_id": q["doc_id"],
            "n_tokens": q["n_tokens"],
            "quality": q["quality"],
            "lat": pa.array(lat), "lng": pa.array(lng),
        })

    enriched = deduped.map_batches(enrich, batch_format="pyarrow")
    return engine.lookup_points(enriched)


def sql_training_pipeline(quality_min: float = QUALITY_MIN) -> str:
    """Exact DuckDB oracle for ``curated_corpus``."""
    from ..oracle import zones_join_cte
    from ..sources.docgen import geo_point_sql_expr

    lat, lng = geo_point_sql_expr("0")
    lat = lat.replace("doc_id", "d.doc_id")
    lng = lng.replace("doc_id", "d.doc_id")
    qual = (r"(CAST(len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b'))"
            r" AS DOUBLE) / greatest(len(regexp_extract_all(text, '\S+')), 1)"
            r" + CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)"
            r" / greatest(length(text), 1))")
    return f"""WITH keepers AS (
  SELECT md5(text) AS dg, min(doc_id) AS keep_id
  FROM documents GROUP BY 1),
kept AS (
  SELECT d.* FROM documents d
  JOIN keepers k ON md5(d.text) = k.dg AND d.doc_id = k.keep_id),
quality AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
         {qual} AS quality
  FROM kept WHERE {qual} >= {quality_min!r}),
pts AS (
  SELECT CAST(q.doc_id AS BIGINT) AS doc_id, q.n_tokens, q.quality,
         {lat.replace('d.doc_id', 'q.doc_id')} AS lat,
         {lng.replace('d.doc_id', 'q.doc_id')} AS lng
  FROM quality q),
{zones_join_cte(key_cols=("doc_id",))},
ranked AS (
  SELECT doc_id, zone_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY area_rank) AS rn
  FROM zone_match)
SELECT p.doc_id, p.n_tokens, p.quality, p.lat, p.lng,
       r.zone_id AS zone_id, (r.zone_id IS NOT NULL) AS matched
FROM pts p
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (doc_id)"""
