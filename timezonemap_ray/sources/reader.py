"""Table reader seam — Lance in production, Parquet stand-in here.

The north_rule targets trillion-row **Lance** document tables. Lance is not
installed in this sandbox, so every pipeline reads through this seam:
``read_table(path)`` dispatches on extension/availability — a ``.lance``
dataset uses ``lance`` (column projection + fragment-parallel scan via
``ray.data.read_lance``) when importable, anything else falls back to
``ray.data.read_parquet`` with the same column-pruning contract.
"""

from __future__ import annotations

from typing import Optional


def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_table(path: str, columns: Optional[list] = None, **kwargs):
    """Ray Dataset from a Lance dataset dir, Parquet, CSV, or JSON(L).

    Always pass ``columns`` — at 100 TB an unpruned scan is a bug (CSV/JSON
    can't push projection into the read; they project right after parse).
    """
    import ray.data as rd
    p = path.rstrip("/")
    if p.endswith(".lance"):
        if not lance_available():
            raise NotImplementedError(
                "Lance input requested but the 'lance' package is not "
                "installed in this environment; convert to parquet or "
                "install lance")
        return rd.read_lance(path, columns=columns, **kwargs)
    if p.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if p.endswith((".json", ".jsonl")):
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns, **kwargs)
