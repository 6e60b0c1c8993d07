"""Offline ETL pipeline: raw table -> preprocessed parquet feature store.

Capability parity with the reference ``run_pipeline``
(preprocess/pipeline.py:125-154): fit numeric+categorical stats once on the
full table, then transform in chunks and emit the preprocessed output —
except the sink is parquet chunk files (the framework's data plane,
SURVEY.md §7) instead of a `{table}_preprocessed` PostgreSQL table, and text
columns expand to fixed-width embedding vectors inline (the reference
uploaded them as pgvector columns, upload_database.py:138-151).

Output layout for table ``t`` under ``out_dir``:
  t_chunk_0000.parquet ...   preprocessed rows (pk + flags + features + emb)
  t_numeric.json             fitted numeric stats
  t_categorical.json         fitted vocabs (+ model spec with input_dims)
  t_manifest.json            chunk list, row counts, column groups
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Mapping

import numpy as np

from jodalrob_twotower_tpu.etl.categorical import CategoricalPreprocessor
from jodalrob_twotower_tpu.etl.numeric import NumericPreprocessor
from jodalrob_twotower_tpu.etl.text import TextPreprocessor


def _write_parquet(path: Path, columns: Mapping[str, np.ndarray]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    arrays = {}
    for name, arr in columns.items():
        arr = np.asarray(arr)
        if arr.ndim == 2:  # embedding block -> fixed-size list column
            arrays[name] = pa.array(list(arr), type=pa.list_(pa.float32(), arr.shape[1]))
        else:
            arrays[name] = pa.array(arr)
    pq.write_table(pa.table(arrays), str(path))


def run_pipeline(
    table_name: str,
    chunks: Iterable[Mapping[str, np.ndarray]],
    out_dir: str | Path,
    *,
    pk_columns: list[str],
    numeric_columns: list[str],
    categorical_columns: list[str],
    text_columns: list[str] | None = None,
    numeric_configs: Mapping | None = None,
    categorical_configs: Mapping | None = None,
    text_configs: Mapping | None = None,
    fit_table: Mapping[str, np.ndarray] | None = None,
    text_embedder=None,
) -> dict:
    """Fit on ``fit_table`` (or the concatenation of chunks), then transform
    chunk-by-chunk to parquet. Returns the manifest dict."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if fit_table is None:
        # fitting needs every row at once, so only THIS branch may
        # materialize the stream; with a precomputed fit_table the chunks
        # stay a lazy iterator (tables larger than host RAM are the whole
        # point of the chunked API)
        chunks = list(chunks)
        fit_table = {
            col: np.concatenate([np.asarray(c[col], dtype=object) for c in chunks])
            for col in (*pk_columns, *numeric_columns, *categorical_columns, *(text_columns or []))
        }

    num = NumericPreprocessor(numeric_configs or {}).fit(fit_table, numeric_columns)
    cat = CategoricalPreprocessor(categorical_configs or {}).fit(fit_table, categorical_columns)
    txt = (
        TextPreprocessor(text_configs or {}, embedder=text_embedder)
        if text_columns
        else None
    )

    num.save(out / f"{table_name}_numeric.json")
    cat_payload = cat.to_dict()
    cat_payload["model_spec"] = cat.model_spec()
    (out / f"{table_name}_categorical.json").write_text(
        json.dumps(cat_payload, ensure_ascii=False, indent=2)
    )

    chunk_files = []
    total_rows = 0
    for i, chunk in enumerate(chunks):
        cols: dict[str, np.ndarray] = {}
        for pk in pk_columns:
            cols[pk] = np.asarray(chunk[pk]).astype(str)
        cols.update(num.transform(chunk))
        cols.update(cat.transform(chunk))
        if txt is not None:
            cols.update(txt.transform(chunk, text_columns))
        fname = f"{table_name}_chunk_{i:04d}.parquet"
        _write_parquet(out / fname, cols)
        chunk_files.append(fname)
        total_rows += len(next(iter(cols.values())))

    manifest = {
        "table": table_name,
        "rows": total_rows,
        "chunks": chunk_files,
        "pk": pk_columns,
        "numeric_outputs": num.output_columns,
        "categorical_outputs": list(cat.vocabs.keys()),
        "categorical_input_dims": cat.input_dims(),
        "text_outputs": list(text_columns or []),
        "text_embed_dim": txt.embed_dim if txt is not None else 0,
    }
    (out / f"{table_name}_manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def update_text_embeddings(
    out_dir: str | Path,
    table_name: str,
    column: str,
    texts_by_pk: Mapping[str, str],
    *,
    embedder=None,
    text_config: Mapping | None = None,
) -> int:
    """Incrementally re-embed one text column for selected rows.

    Capability parity with the reference's text_vector_updator.py
    (chunked UPDATE of one pgvector column): chunks containing affected PKs
    are rewritten in place with fresh embeddings; untouched chunks are left
    alone. Returns the number of rows updated.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out_dir)
    manifest = json.loads((out / f"{table_name}_manifest.json").read_text())
    if column not in manifest["text_outputs"]:
        raise KeyError(f"{column!r} is not a text column of {table_name!r}")
    pk_cols = manifest["pk"]
    txt = TextPreprocessor({column: text_config or {}}, embedder=embedder)
    updated = 0
    for fname in manifest["chunks"]:
        path = out / fname
        tbl = pq.read_table(str(path))
        n = tbl.num_rows
        if len(pk_cols) == 1:
            keys = [str(v) for v in tbl.column(pk_cols[0]).to_pylist()]
        else:
            cols = [tbl.column(c).to_pylist() for c in pk_cols]
            keys = ["|".join(str(v) for v in row) for row in zip(*cols)]
        hit = [i for i, k in enumerate(keys) if k in texts_by_pk]
        if not hit:
            continue
        emb_col = tbl.column(column).to_numpy(zero_copy_only=False)
        block = np.stack(emb_col).astype(np.float32)
        new_texts = [texts_by_pk[keys[i]] for i in hit]
        new_out = txt.transform({column: np.asarray(new_texts, object)}, [column])
        block[hit] = new_out[column]
        dim = block.shape[1]
        new_arr = pa.array(list(block), type=pa.list_(pa.float32(), dim))
        tbl = tbl.set_column(tbl.column_names.index(column), column, new_arr)
        flag_col = f"{column}_is_null"
        if flag_col in new_out and flag_col in tbl.column_names:
            flags = tbl.column(flag_col).to_numpy(zero_copy_only=False).astype(np.float32)
            flags[hit] = new_out[flag_col]
            tbl = tbl.set_column(tbl.column_names.index(flag_col), flag_col, pa.array(flags))
        pq.write_table(tbl, str(path))
        updated += len(hit)
    return updated


def iter_preprocessed_chunks(out_dir: str | Path, table_name: str):
    """Yield each preprocessed chunk as a column dict (embeddings -> [N, D]),
    in manifest order — streaming counterpart of :func:`load_preprocessed`
    (feeds e.g. the PG write-back without holding the table in memory)."""
    import pyarrow.parquet as pq

    out = Path(out_dir)
    manifest = json.loads((out / f"{table_name}_manifest.json").read_text())
    for fname in manifest["chunks"]:
        tbl = pq.read_table(str(out / fname))
        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            data = col.to_numpy(zero_copy_only=False)
            if data.dtype == object and len(data) and isinstance(data[0], np.ndarray):
                data = np.stack(data).astype(np.float32)
            cols[name] = data
        yield cols


def load_preprocessed(out_dir: str | Path, table_name: str) -> dict[str, np.ndarray]:
    """Read all chunks back into one column dict (embeddings -> [N, D])."""
    parts = list(iter_preprocessed_chunks(out_dir, table_name))
    return {
        name: np.concatenate([p[name] for p in parts])
        for name in parts[0]
    }
