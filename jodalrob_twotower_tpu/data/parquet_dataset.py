"""Parquet dataset layout: the framework's durable data plane.

The reference streamed features and pairs from PostgreSQL
(unified_bid_data_loader.py, feature_store.py); per SURVEY.md §7 the data
plane here is parquet files:

  <dir>/schema.json        TwoTowerSchema
  <dir>/notice.parquet     notice FeatureStore (wide columns)
  <dir>/company.parquet    company FeatureStore
  <dir>/pairs.parquet      positive pairs as (notice_key, company_key)

Pairs are stored by KEY (not row index) so stores can be re-built / filtered
independently; loading joins keys to row indices through the stores' PK maps
with the same guaranteed-ID-match semantics the reference's test-mode loader
enforced (unified_bid_data_loader.py:1208-1229): pairs referencing missing
keys are dropped (counted), never crash.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.schema import TwoTowerSchema


def save_pairs_parquet(
    path: str | Path,
    notice_keys: np.ndarray,
    company_keys: np.ndarray,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "notice_key": pa.array(np.asarray(notice_keys).astype(str)),
                "company_key": pa.array(np.asarray(company_keys).astype(str)),
            }
        ),
        str(path),
    )


def load_pairs_parquet(
    path: str | Path,
    notice_store: FeatureStore,
    company_store: FeatureStore,
    *,
    on_missing: str = "drop",
) -> np.ndarray:
    """Load pairs and join to store row indices -> int64 [P, 2].

    ``on_missing``: 'drop' (default, reference test-mode semantics) or
    'error'.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(str(path))
    n_keys = tbl.column("notice_key").to_pylist()
    c_keys = tbl.column("company_key").to_pylist()
    n_map = notice_store.key_to_row
    c_map = company_store.key_to_row
    rows = np.empty((len(n_keys), 2), dtype=np.int64)
    kept = 0
    missing = 0
    for nk, ck in zip(n_keys, c_keys):
        ni = n_map.get(nk)
        ci = c_map.get(ck)
        if ni is None or ci is None:
            missing += 1
            if on_missing == "error":
                raise KeyError(f"pair references missing key: ({nk!r}, {ck!r})")
            continue
        rows[kept, 0] = ni
        rows[kept, 1] = ci
        kept += 1
    return rows[:kept]


def save_dataset(
    directory: str | Path,
    schema: TwoTowerSchema,
    notice_store: FeatureStore,
    company_store: FeatureStore,
    pairs_rows: np.ndarray,
) -> Path:
    """Write the full dataset layout (stores by row -> keys for pairs)."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    schema.to_json(d / "schema.json")
    notice_store.to_parquet(d / "notice.parquet")
    company_store.to_parquet(d / "company.parquet")
    save_pairs_parquet(
        d / "pairs.parquet",
        notice_store.keys[pairs_rows[:, 0]],
        company_store.keys[pairs_rows[:, 1]],
    )
    return d
