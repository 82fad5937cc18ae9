"""Input sources for the index build: Parquet (canonical), JSONL, CSV.

The reference's source is an HTTP crawler (obsolete under the graft —
SURVEY.md §2.1 S1/S2); the rebuild's source contract is "a table of
transcripts on shared storage". Parquet is the first-class format (column
pruning, row-group statistics, footer-count); JSONL and CSV are accepted
for interoperability — they read through ``ray.data.read_json`` /
``read_csv`` with a post-read projection (no column pruning at the
reader, so prefer Parquet at scale).

Format is detected from file extensions or forced via ``input_format=``.
"""

from __future__ import annotations

import os

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
}
SUPPORTED_FORMATS = ("parquet", "json", "csv")


def detect_format(files: list[str]) -> str:
    fmts = {f: _EXT_FORMAT.get(os.path.splitext(f)[1].lower()) for f in files}
    unknown = [f for f, v in fmts.items() if v is None]
    if unknown:
        raise ValueError(f"unsupported input extension: {unknown[:3]}")
    distinct = set(fmts.values())
    if len(distinct) > 1:
        raise ValueError(f"mixed input formats: {sorted(distinct)}")
    return distinct.pop()


def expand_input(
    input_path: str | list[str], input_format: str | None = None
) -> tuple[list[str], str]:
    """Sorted input file list + resolved format. Directories are listed for
    any supported extension (Parquet preferred when mixed listings exist)."""
    if isinstance(input_path, (list, tuple)):
        files = sorted(input_path)
    elif os.path.isdir(input_path):
        # skip sidecars (_meta.json, _SUCCESS, .crc …) per the Hadoop/Spark
        # underscore/dot convention — they are metadata, not table data
        all_files = sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if not f.startswith(("_", "."))
            and os.path.splitext(f)[1].lower() in _EXT_FORMAT
        )
        if input_format:
            files = [
                f
                for f in all_files
                if _EXT_FORMAT[os.path.splitext(f)[1].lower()] == input_format
            ]
        else:
            fmts = {_EXT_FORMAT[os.path.splitext(f)[1].lower()] for f in all_files}
            if len(fmts) > 1 and "parquet" in fmts:
                # mixed listing: Parquet is canonical, other extensions are
                # assumed auxiliary exports of the same directory
                files = [f for f in all_files if f.endswith(".parquet")]
            else:
                files = all_files
    else:
        files = [input_path]
    if not files:
        raise ValueError(f"no supported input files under {input_path}")
    fmt = input_format or detect_format(files)
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported input format: {fmt}")
    return files, fmt


def read_parquet_clean(path, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with the file-level schema metadata
    stripped at the read.

    Pandas-written parquet carries a ``b'pandas'`` schema-metadata blob; a
    ``pa.Schema`` with metadata is UNHASHABLE, so every multi-block concat
    in Ray's batcher logs "Failed to hash the schemas (for deduplication)"
    (``ray/data/_internal/arrow_ops/transform_pyarrow.py``) — noise that
    buries real warnings. Passing a metadata-free (column-pruned) schema
    gives every downstream stage clean, hashable block schemas."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    first = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(first):  # sniff the schema from any file inside
        first = next(
            os.path.join(first, f)
            for f in sorted(os.listdir(first))
            if f.endswith(".parquet")
        )
    schema = pq.read_schema(first).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def read_dataset(files: list[str], fmt: str, columns: list[str],
                 schema=None):
    """Ray Dataset over the inputs projected to ``columns``. Parquet prunes
    at the read; JSON/CSV read whole rows then project (interop path).
    CSV always parses with ``newlines_in_values`` — quoted embedded
    newlines otherwise desync pyarrow's block chunker on any shard larger
    than one read block. Pass ``schema`` (a pa.Schema over the projected
    columns) to pin JSON/CSV column types instead of trusting per-shard
    inference (all-numeric-looking or all-null text columns would
    otherwise come back as int64/null and break string consumers)."""
    import ray.data as rd

    if fmt == "parquet":
        return read_parquet_clean(files, columns=columns)
    if fmt == "json":
        import pyarrow.json as pj

        kw = {}
        if schema is not None:
            kw["parse_options"] = pj.ParseOptions(explicit_schema=schema)
        return rd.read_json(files, **kw).select_columns(columns)
    if fmt == "csv":
        import pyarrow.csv as pcsv

        kw = {"parse_options": pcsv.ParseOptions(newlines_in_values=True)}
        if schema is not None:
            kw["convert_options"] = pcsv.ConvertOptions(
                column_types={f.name: f.type for f in schema})
        return rd.read_csv(files, **kw).select_columns(columns)
    raise ValueError(f"unsupported input format: {fmt}")


def read_columns_local(files: list[str], fmt: str, columns: list[str]):
    """Driver-side pyarrow read of selected columns (small-input fast path —
    a Ray job's fixed latency would dominate). Returns one pa.Table."""
    import pyarrow as pa

    tables = []
    for f in files:
        if fmt == "parquet":
            import pyarrow.parquet as pq

            tables.append(pq.read_table(f, columns=columns))
        elif fmt == "json":
            import pyarrow.json as pj

            tables.append(pj.read_json(f).select(columns))
        elif fmt == "csv":
            import pyarrow.csv as pcsv

            tables.append(pcsv.read_csv(
                f, parse_options=pcsv.ParseOptions(newlines_in_values=True)
            ).select(columns))
        else:
            raise ValueError(f"unsupported input format: {fmt}")
    return pa.concat_tables(tables, promote_options="permissive")


def _format_roundtrip(sf_dir: str, fmt: str):
    """(doc_id, n_chars_rt, fp_rt): the documents table pushed through a
    full format round trip — distributed ``write_json``/``write_csv`` to
    shard files, re-ingested through the same ``read_dataset`` path the
    build accepts (`input_format=`), then length + md5 re-derived from
    the ROUND-TRIPPED text. Hash-equal to the oracle computed on the
    ORIGINAL parquet ⟺ every document survived the conversion
    byte-exactly — the source-interop contract as a value-checked
    pipeline instead of a pytest-only claim. (CSV collapses empty
    strings to null; both sides fingerprint coalesce(text, ''), so the
    ambiguity is contract-visible, not hidden.)

    Scale shape: the conversion writes one shard file per block
    (distributed, idempotent per (sf_dir, fmt) via a marker file) and the
    re-read streams those shards; the fingerprint pass is the standard
    per-batch map. Nothing corpus-sized touches the driver."""
    import hashlib
    import shutil

    import numpy as np
    import pyarrow as pa

    # cache key: (abspath, code version) names the corpus; (mtime_ns,
    # size) stamps its content — a mutated corpus can never be served
    # stale shards, and older stamps of the SAME corpus are pruned so
    # /tmp doesn't accumulate corpus-sized orphans
    src_path = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src_path)
    path_tag = hashlib.md5(f"{src_path}|v1".encode()).hexdigest()[:10]
    stamp_tag = hashlib.md5(
        f"{st.st_mtime_ns}|{st.st_size}".encode()).hexdigest()[:10]
    prefix = f"searchengine_ray_{fmt}_rt_{path_tag}_"
    out = os.path.join("/tmp", prefix + stamp_tag)
    marker = os.path.join(out, "_CONVERTED")
    if not os.path.exists(marker):
        for old in os.listdir("/tmp"):  # prune stale stamps of this corpus
            if old.startswith(prefix) and old != prefix + stamp_tag:
                shutil.rmtree(os.path.join("/tmp", old), ignore_errors=True)
        # write into a scratch dir and os.replace into place — the
        # export_shards convention: a crashed or concurrent run can never
        # leave a half-written shard set that lists as complete
        tmp_out = out + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp_out, ignore_errors=True)
        src = read_parquet_clean(src_path, columns=["doc_id", "text"])
        if fmt == "json":
            src.write_json(tmp_out)
        else:
            src.write_csv(tmp_out)
        with open(os.path.join(tmp_out, "_CONVERTED"), "w") as f:
            f.write(src_path)
        try:
            os.replace(tmp_out, out)
        except OSError:  # a concurrent run won the rename: use its copy
            shutil.rmtree(tmp_out, ignore_errors=True)

    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(f".{fmt}")]

    def fingerprint(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        texts = [(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_chars_rt": pa.array(
                np.asarray([len(t) for t in texts], dtype="int64")),
            "fp_rt": pa.array(
                [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                type=pa.string()),
        })

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    return read_dataset(files, fmt, ["doc_id", "text"],
                        schema=schema).map_batches(
        fingerprint, batch_format="pyarrow", batch_size=2048)


def jsonl_roundtrip(sf_dir: str):
    """JSONL round trip — see :func:`_format_roundtrip`."""
    return _format_roundtrip(sf_dir, "json")


def csv_roundtrip(sf_dir: str):
    """CSV round trip — see :func:`_format_roundtrip`."""
    return _format_roundtrip(sf_dir, "csv")
