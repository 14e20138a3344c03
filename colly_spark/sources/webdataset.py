"""WebDataset tar-shard export + ingest — the consumption format of
large-scale image+caption training (LAION, DataComp, OpenCLIP all ship
POSIX tar shards where one training sample is a run of adjacent files
sharing a basename key: ``000042.jpg`` + ``000042.txt`` +
``000042.json``).  A curation engine over the input_hint image table
(image_id, bytes, w, h, fmt, caption, phash) that cannot emit and
re-read this format leaves the last pipeline step — "hand the curated
corpus to the trainer" — undone, so both directions are first-class,
mirroring sources/warc.py:

- ``to_webdataset(df, out_dir)`` — distributed sink: each partition of
  a (key, files map<ext,binary>) sample DataFrame becomes one or more
  ``part-PPPPP-SSS.tar`` shards (rolled every ``shard_rows`` samples —
  trainers want many same-sized shards for loader parallelism), written
  executor-side with a manifest DataFrame collected back (path,
  samples, files, bytes).  No sample data ever moves to the driver.
- ``image_samples(df)`` — the input_hint image table → sample shape:
  ``{key}.{fmt}`` bytes + ``{key}.txt`` caption + ``{key}.json``
  metadata, the LAION layout.
- ``read_webdataset(spark, glob)`` — distributed source: whole-file
  parallelism over ``binaryFile`` rows, one flat row per component
  file (path, key, ext, data, offset, size) with the member's byte
  offset inside the tar recovered, so the scan doubles as the index.
- ``webdataset_index`` / ``read_webdataset_members`` — component-level
  random access by (path, offset, size): tar stores file data
  contiguously, so a member read is one range GET — the object-store
  shape when shards are few and huge.
- ``samples_from_components(df)`` — flat component rows back to
  (key, files map<ext,binary>) declaratively (map_from_entries — no
  UDF).

Key rule (webdataset convention): the sample key is the member name up
to the FIRST dot of its basename; everything after is the extension
(may itself contain dots, e.g. ``seg.png``).  Writers emit a sample's
files adjacently — readers depend on it — and this writer emits them
sorted by extension within the sample.

Determinism: USTAR format, mtime/uid/gid pinned to 0, empty
uname/gname, mode 0644 — byte-identical shards for identical input
partitions (the WARC sink's gzip-mtime discipline applied to tar).

Reference tie-in: the reference hands fetched bodies to callbacks and
leaves persistence to the user (response.go); at 100 TB the fetched
image+caption corpus must land in the trainer's wire format without a
driver round-trip, which is exactly this sink.
"""

from __future__ import annotations

import io
import tarfile

_FLAT_SCHEMA = ("path string, key string, ext string, data binary, "
                "offset long, size long")
_MANIFEST_SCHEMA = "path string, samples long, files long, bytes long"


def split_key(name: str) -> tuple:
    """Member name → (key, ext) at the first dot of the basename
    (directories, rare in shards, stay part of the key)."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        return name, ""
    return name[:dot], name[dot + 1:]


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def build_shard(samples) -> bytes:
    """One tar shard (bytes) from [(key, {ext: bytes})] — files of a
    sample adjacent, sorted by ext; deterministic byte output."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key, files in samples:
            for ext in sorted(files):
                data = files[ext]
                name = f"{key}.{ext}" if ext else key
                tf.addfile(_tarinfo(name, len(data)), io.BytesIO(data))
    return buf.getvalue()


def parse_shard_bytes(data: bytes, path: str = ""):
    """Yield flat component dicts from one tar shard's bytes, with each
    member's data offset/size inside the shard (the range-GET index)."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            key, ext = split_key(m.name)
            yield dict(path=path, key=key, ext=ext,
                       data=tf.extractfile(m).read(),
                       offset=int(m.offset_data), size=int(m.size))


_FLAT_COLS = ("path", "key", "ext", "data", "offset", "size")


def _flat_pdf(rows):
    import pandas as pd

    return (pd.DataFrame(rows, columns=_FLAT_COLS) if rows
            else pd.DataFrame({c: [] for c in _FLAT_COLS}))


# ---------------------------------------------------------------------------
# Spark surfaces


def image_samples(df, id_col: str = "image_id", bytes_col: str = "bytes",
                  fmt_col: str = "fmt", caption_col: str = "caption"):
    """input_hint image table → WebDataset sample shape
    (key, files map<string,binary>): ``{key}.{fmt}`` image bytes,
    ``{key}.txt`` caption, ``{key}.json`` remaining metadata — all
    declarative (to_json / map_from_arrays), no UDF."""
    from pyspark.sql import functions as F

    meta_cols = [c for c in df.columns
                 if c not in (id_col, bytes_col, fmt_col, caption_col)]
    meta = F.to_json(F.struct(*[F.col(c) for c in sorted(meta_cols)],
                              F.col(fmt_col).alias("fmt")))
    return df.select(
        F.col(id_col).alias("key"),
        F.map_from_arrays(
            F.array(F.col(fmt_col), F.lit("txt"), F.lit("json")),
            F.array(F.col(bytes_col),
                    F.encode(F.coalesce(F.col(caption_col), F.lit("")),
                             "UTF-8"),
                    F.encode(meta, "UTF-8"))).alias("files"))


def to_webdataset(df, out_dir: str, shard_rows: int = 10_000):
    """Distributed WebDataset export: each partition of ``df`` —
    (key string, files map<string,binary>) — becomes ``part-PPPPP-SSS
    .tar`` shards of ≤ ``shard_rows`` samples, written executor-side.
    Returns the collected manifest [(path, samples, files, bytes)];
    the action IS the write.  Partition/sort upstream for shard
    locality (e.g. repartitionByRange(key) for resumable ordering)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write(batches):
        import os

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out, pending, shard_no = [], [], 0

        def flush():
            nonlocal pending, shard_no
            if not pending:
                return
            blob = build_shard(pending)
            path = os.path.join(out_dir, f"part-{pid:05d}-{shard_no:03d}.tar")
            with open(path, "wb") as f:
                f.write(blob)
            out.append(dict(path=path, samples=len(pending),
                            files=sum(len(fs) for _, fs in pending),
                            bytes=len(blob)))
            pending, shard_no = [], shard_no + 1

        for pdf in batches:
            for key, files in zip(pdf["key"], pdf["files"]):
                # Arrow hands MapType to pandas as a list of (k, v)
                # tuples, plain createDataFrame rows as dicts — accept both
                items = files.items() if hasattr(files, "items") else files
                pending.append((key, {e: bytes(d) for e, d in items}))
                if len(pending) >= shard_rows:
                    flush()
        flush()
        yield pd.DataFrame(out, columns=["path", "samples", "files", "bytes"])

    return df.select("key", "files").mapInPandas(
        write, schema=_MANIFEST_SCHEMA).collect()


def read_webdataset(spark, path_glob: str):
    """Distributed WebDataset scan: one task per shard file (the
    trainer-native split — shards are built to be the unit of loader
    parallelism).  Returns one row per component file:
    (path, key, ext, data, offset, size)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_shard_bytes(bytes(content), path))
            yield _flat_pdf(rows)

    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content"))
    return files.mapInPandas(parse, schema=_FLAT_SCHEMA)


def webdataset_index(spark, path_glob: str):
    """Component index over a shard glob: (key, ext, path, offset,
    size, digest) — where every sample file's bytes live, making
    component-level random access possible."""
    from pyspark.sql import functions as F

    return (read_webdataset(spark, path_glob)
            .select("key", "ext", "path", "offset", "size",
                    F.sha2(F.col("data"), 256).alias("digest")))


def read_webdataset_members(spark, index_df):
    """Component-level parallel reads: seek to each (path, offset) and
    read exactly ``size`` bytes — tar stores member data contiguously,
    so this is the object-store range-GET shape.  ``index_df`` needs
    (path, key, ext, offset, size); repartition it to spread one huge
    shard's members across the cluster."""

    def fetch(batches):
        for pdf in batches:
            rows = []
            for path, key, ext, off, size in zip(
                    pdf["path"], pdf["key"], pdf["ext"],
                    pdf["offset"], pdf["size"]):
                if path.startswith("file:"):
                    from urllib.parse import unquote, urlparse
                    local = unquote(urlparse(path).path)
                else:
                    local = path
                with open(local, "rb") as f:
                    f.seek(int(off))
                    data = f.read(int(size))
                rows.append(dict(path=path, key=key, ext=ext, data=data,
                                 offset=int(off), size=int(size)))
            yield _flat_pdf(rows)

    return index_df.select("path", "key", "ext", "offset", "size").mapInPandas(
        fetch, schema=_FLAT_SCHEMA)


def samples_from_components(df):
    """Flat component rows back to the sample shape (key, files
    map<ext,binary>) — pure Catalyst (collect_list + map_from_entries),
    one groupBy(key) shuffle."""
    from pyspark.sql import functions as F

    return (df.groupBy("key")
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("ext", "data"))))
                .alias("files")))
