"""WebDataset sharded-tar source — the standard public interchange
layout for large image/audio/text multimodal corpora (Aizman et al.,
"High Performance I/O For Large Scale Deep Learning", IEEE BigData
2019; the webdataset library's POSIX-tar convention). A corpus is a
set of ~bounded-size ``.tar`` / ``.tar.gz`` shards; each sample is a
run of CONSECUTIVE members sharing a key (``000123.jpg``,
``000123.json``, ``000123.txt`` → one sample with three fields).

Reference parity note: the reference job (gluejob.py) reads CSV,
parquet and JDBC only; this module is the image-side analog of
``sources/warc.py`` — the container an LLM multimodal ingest actually
starts from, feeding the engine's binary-payload operators
(operators/multimodal: dhash64 / image_dedup_frame / resize_media)
the same way read_warc feeds the text-curation chain.

Scale shape — the SHARD is the parallelism unit, exactly as in
production WebDataset loaders: the format exists because object
stores and tape-like media want few big sequential files, and the
layout bounds SHARD SIZE and grows SHARD COUNT (a 100-TB image
corpus is ~100k shards of ~1 GB). ``spark.read.format("binaryFile")``
gives one task per shard; member assembly is a sequential tar scan
WITHIN a shard (tarfile's streaming ``r|`` mode — 512-byte header
blocks + per-member reads, never the random-access index build).
Payload bytes stay in Arrow batches end-to-end; the driver never
sees member data. Member filters (``extensions``, ``max_member``)
apply inside the generator, before any shuffle.

Memory contract: tarfile's streaming mode holds one member at a
time; the output pandas frame is flushed every chunk (bytes or rows,
whichever trips first) at SAMPLE boundaries — task resident set is
bounded by the chunk plus the largest single sample, not the shard
(the read_warc chunk-flush contract). ``binaryFile`` still hands the
task the raw (compressed) shard bytes whole — same honest bound as
read_warc.

NULL handling: tar members are never NULL (a zero-byte file is an
empty binary); non-regular members (directories, PAX headers,
symlinks) are skipped. A member whose basename has no dot cannot
carry a field name — its full basename becomes the key and its ext
is '' (kept unless an ``extensions`` filter excludes it).
"""

from __future__ import annotations

import gzip
import io
import tarfile
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WDS_MEMBER_SCHEMA = "shard string, key string, ext string, data binary"
WDS_SAMPLE_SCHEMA = "shard string, key string, members map<string, binary>"


def split_member_name(name: str) -> tuple[str, str] | None:
    """Tar member name -> (key, ext), the WebDataset convention: the
    basename splits at its FIRST dot (so ``0001.seg.png`` is field
    ``seg.png`` of sample ``0001`` — multi-dot extensions carry
    sub-field structure); directories stay on the key, so
    ``train/0001.jpg`` groups under ``train/0001``.

    Returns None for a dot-leading basename (macOS AppleDouble
    ``._0001.jpg``, ``.hidden``). For a BARE hidden name this matches
    the reference implementation's ``base_plus_ext`` regex (non-empty
    key required before the first dot). For a directory-qualified one
    (``train/._0001.jpg``) it is a DELIBERATE DIVERGENCE: that regex
    backtracks and matches key ``train/``, ext ``_0001.jpg``, so
    upstream would merge a run of hidden files into one bogus sample
    keyed by the bare directory prefix — dropping them is the saner
    behavior (r13 sources review; divergence scope pinned by r13
    advice)."""
    slash = name.rfind("/")
    head, base = name[: slash + 1], name[slash + 1 :]
    dot = base.find(".")
    if dot == 0:
        return None
    if dot < 0:
        return head + base, ""
    return head + base[:dot], base[dot + 1 :]


def iter_tar_members(
    name: str, raw: bytes
) -> Iterator[tuple[str, str, bytes]]:
    """(key, ext, data) per regular member of one shard, in tar
    order. Streaming mode (``r|`` / ``r|gz``): sequential scan, one
    member resident at a time — the random-access ``r:`` mode would
    build a full member index first."""
    mode = "r|gz" if name.endswith(".gz") else "r|"
    with tarfile.open(fileobj=io.BytesIO(raw), mode=mode) as tf:
        for member in tf:
            if not member.isreg():
                continue
            f = tf.extractfile(member)
            data = f.read() if f is not None else b""
            split = split_member_name(member.name)
            if split is None:  # hidden/AppleDouble member — not a field
                continue
            key, ext = split
            yield key, ext, data


def _kept_exts(extensions: Iterable[str] | None) -> set[str] | None:
    """None -> keep all; an EMPTY collection keeps none (the
    read_warc types convention — an empty filter never silently
    widens to keep-all)."""
    if extensions is None:
        return None
    return {e.lower().lstrip(".") for e in extensions}


def read_webdataset(
    spark: SparkSession,
    path: str,
    extensions: Iterable[str] | None = None,
    max_member: int | None = None,
) -> DataFrame:
    """Directory (or glob) of .tar / .tar.gz shards -> one row per
    kept member: (shard, key, ext, data). The flat form — use
    :func:`read_webdataset_samples` for one-row-per-sample with the
    fields pivoted into a map (no shuffle; grouping rides the tar's
    own contiguity)."""
    kept = _kept_exts(extensions)
    files = spark.read.format("binaryFile").load(path)
    chunk_bytes = 64 << 20
    chunk_rows = 10_000

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "ext", "data"]
        out: list[tuple] = []
        held = 0
        for batch in batches:
            for fname, raw in zip(batch["path"], batch["content"]):
                for key, ext, data in iter_tar_members(fname, bytes(raw)):
                    if kept is not None and ext.lower() not in kept:
                        continue
                    if max_member is not None and len(data) > max_member:
                        continue
                    out.append((fname, key, ext, data))
                    held += len(data)
                    if held >= chunk_bytes or len(out) >= chunk_rows:
                        yield pd.DataFrame(out, columns=cols)
                        out, held = [], 0
        yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(
        parse, WDS_MEMBER_SCHEMA
    )


def read_webdataset_samples(
    spark: SparkSession,
    path: str,
    extensions: Iterable[str] | None = None,
    max_member: int | None = None,
) -> DataFrame:
    """One row per SAMPLE: (shard, key, members map<ext, binary>).

    Grouping is free: WebDataset requires a sample's members to be
    CONSECUTIVE in the shard, so the generator closes a sample when
    the key changes — zero shuffle, versus the groupBy a flat-rows
    pivot would cost at 100 TB. A key reappearing non-consecutively
    (out-of-spec shard) yields separate samples rather than silently
    merging across the gap. Duplicate exts within one sample keep the
    LAST occurrence (map key overwrite, matching the webdataset
    library's dict-build). Samples whose every member was filtered
    out still appear with an empty map only if the sample had kept=()
    members — i.e. fully-filtered samples are dropped, never
    fabricated. Chunk flushes happen at sample boundaries, so a
    sample is never split across output frames."""
    kept = _kept_exts(extensions)
    files = spark.read.format("binaryFile").load(path)
    chunk_bytes = 64 << 20
    chunk_rows = 10_000

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "members"]
        out: list[tuple] = []
        held = 0

        def flush() -> pd.DataFrame:
            nonlocal out, held
            frame = pd.DataFrame(out, columns=cols)
            out, held = [], 0
            return frame

        for batch in batches:
            for fname, raw in zip(batch["path"], batch["content"]):
                cur_key: str | None = None
                cur: dict[str, bytes] = {}

                def close_sample():
                    nonlocal cur_key, cur, held
                    if cur_key is not None and cur:
                        out.append((fname, cur_key, cur))
                        held += sum(len(v) for v in cur.values())
                    cur_key, cur = None, {}

                for key, ext, data in iter_tar_members(fname, bytes(raw)):
                    if key != cur_key:
                        close_sample()
                        # flush at the sample boundary, INSIDE the
                        # member loop — a per-file check would bound
                        # memory by the shard, not the chunk
                        if held >= chunk_bytes or len(out) >= chunk_rows:
                            yield flush()
                        cur_key = key
                    if kept is not None and ext.lower() not in kept:
                        continue
                    if max_member is not None and len(data) > max_member:
                        continue
                    cur[ext] = data
                close_sample()
        yield flush()

    return files.select("path", "content").mapInPandas(
        parse, WDS_SAMPLE_SCHEMA
    )


def build_tar(samples: Iterable[dict], gz: bool = False) -> bytes:
    """Serialize samples -> shard bytes (test fixtures and the
    bench's synthetic corpus; the build_warc twin). Each sample dict:
    ``key`` (str), ``members`` ({ext: bytes}); members are written
    consecutively in dict order. Deterministic: zeroed mtime/uid/gid
    and gzip mtime so identical inputs build identical shards."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for s in samples:
            for ext, data in s["members"].items():
                name = f"{s['key']}.{ext}" if ext else s["key"]
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gz:
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as f:
            f.write(raw)
        return out.getvalue()
    return raw
