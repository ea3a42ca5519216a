"""WARC container codec (ISO 28500 / WARC 1.0): the Common Crawl shape.

Real web-scale change feeds arrive as WARC files — length-prefixed
records (`WARC/1.0` + header lines + blank line + Content-Length bytes
of payload), thousands per ~1 GB segment file. Reference analog: the
heavy-payload container objects the reference converts per item
(/root/reference/scripts/convert_v1_s2.py:51-181); the engine-side point
is the SOURCE plumbing — render a change feed into standard WARC
segments, and scan WARC segments back into typed rows, distributedly.

Physical strategy:

* **Render is pure codegen**: every record is one JVM-side ``concat``
  (headers + payload + terminator); segment assembly is one hash
  aggregate per segment id with a deterministic in-segment order
  (``sort_array`` on the record's lsn) — no Python in the loop, exactly
  one shuffle keyed by segment.
* **Parse is Arrow-batched ``mapInPandas``** over (segment_id, blob)
  rows — the same shape as scanning real WARC files via
  ``spark.read.format("binaryFile")`` where each task walks whole
  segments with O(1) state (records are length-prefixed, so the walk
  never rescans). Per-SEGMENT Python, never per-row; a narrow map with
  no shuffle, so WARC scanning scales with segment count.
* Change-event metadata that WARC's core headers don't model (the op,
  the language) rides in ``X-``-prefixed extension headers, which the
  spec explicitly permits; lsn maps to ``WARC-Record-ID`` and event
  time to ``WARC-Date`` (microsecond ISO-8601, lossless round-trip).

``strict=True`` raises on any malformed record (truncated payload, bad
headers); ``strict=False`` skips the rest of that segment (a torn tail
from a partial upload) after yielding its valid prefix.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
# Spark's date_format pattern for WARC-Date (microsecond, UTC, lossless)
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

PARSED_SCHEMA = (
    "segment_id bigint, url string, lsn bigint, warc_date string, "
    "op string, lang string, html binary"
)


def warc_record_column() -> F.Column:
    """One standard WARC record as a pure-codegen string expression over
    change-feed columns (url, lsn, warc_ts, op, html, lang)."""
    payload = F.decode(F.col("html"), "UTF-8")  # feed contract: ASCII html
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.concat(F.lit("WARC-Record-ID: <urn:lsn:"), F.col("lsn"), F.lit(">\r\n")),
        F.concat(
            F.lit("WARC-Date: "),
            F.date_format(F.col("warc_ts"), _TS_FMT),
            F.lit("\r\n"),
        ),
        F.concat(F.lit("WARC-Target-URI: "), F.col("url"), F.lit("\r\n")),
        F.concat(F.lit("X-Change-Op: "), F.col("op"), F.lit("\r\n")),
        F.concat(F.lit("X-Lang: "), F.col("lang"), F.lit("\r\n")),
        F.lit("Content-Type: text/html\r\n"),
        F.concat(
            F.lit("Content-Length: "), F.length(payload), F.lit("\r\n\r\n")
        ),
        payload,
        F.lit("\r\n\r\n"),
    )


def render_warc_segments(
    log: DataFrame, n_segments: int = 16
) -> DataFrame:
    """Change-feed rows → WARC segments as DATA: one row per segment id,
    ``blob`` holding concatenated records ordered by lsn. Deterministic
    byte-for-byte: same feed → same segments.

    Memory bound: a segment materializes as ONE row (``collect_list``),
    so this shape is for modest segments (tests, oracles, shipping blobs
    through a DataFrame). Landing real archive-scale segments (~1 GB, the
    Common Crawl shape) goes through
    :func:`streaming.pipeline.write_warc_wal`, which streams records
    into segment FILES with O(Arrow-batch) memory instead of
    materializing any segment as a value."""
    return (
        log.select(
            F.pmod(F.col("lsn"), F.lit(n_segments)).alias("segment_id"),
            F.col("lsn"),
            warc_record_column().alias("rec"),
        )
        .groupBy("segment_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("lsn", "rec"))
                        ),
                        lambda s: s["rec"],
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("blob")
        )
    )


def _parse_header(name, raw: bytes, pos: int, strict: bool):
    """Header block bytes → (headers dict, content-length, lsn), or None
    (lax mode) / ValueError (strict) on malformed records."""
    lines = raw.split(b"\r\n")
    if lines[0] != WARC_VERSION:
        if strict:
            raise ValueError(f"{name}: bad version line {lines[0]!r} at {pos}")
        return None
    hdr: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        hdr[k.decode("ascii").lower()] = v.strip().decode("utf-8")
    try:
        clen = int(hdr["content-length"])
        rid = hdr["warc-record-id"]
        lsn = int(rid[rid.index("<urn:lsn:") + 9 : rid.index(">")])
    except (KeyError, ValueError) as e:
        if strict:
            raise ValueError(
                f"{name}: bad record header at {pos}: {e}"
            ) from None
        return None
    return hdr, clen, lsn


def _walk_segment(seg_id: int, blob: bytes, strict: bool):
    """Length-prefixed walk of one in-memory WARC segment: O(bytes)."""
    pos, n = 0, len(blob)
    while pos < n:
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            if strict:
                raise ValueError(
                    f"segment {seg_id}: unterminated header block at {pos}"
                )
            return
        parsed = _parse_header(
            f"segment {seg_id}", blob[pos:head_end], pos, strict
        )
        if parsed is None:
            return
        hdr, clen, lsn = parsed
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end + 4 > n or blob[body_end : body_end + 4] != b"\r\n\r\n":
            if strict:
                raise ValueError(
                    f"segment {seg_id}: truncated record at {pos} "
                    f"(declared {clen} bytes)"
                )
            return
        yield (
            seg_id,
            hdr.get("warc-target-uri"),
            lsn,
            hdr.get("warc-date"),
            hdr.get("x-change-op"),
            hdr.get("x-lang"),
            blob[body_start:body_end],
        )
        pos = body_end + 4


def _walk_file(name: str, fh, strict: bool, chunk: int = 1 << 20):
    """Buffered streaming walk of an open WARC segment file: memory is
    O(chunk + one record), NEVER O(segment) — a 1 GB archive segment
    parses in constant memory (the whole-blob path cannot: binaryFile
    materializes the file as one cell, then copies it through
    UnsafeRow + Arrow)."""
    buf = bytearray()
    eof = False

    def _fill(need: int) -> bool:
        nonlocal eof
        while len(buf) < need and not eof:
            piece = fh.read(max(chunk, need - len(buf)))
            if not piece:
                eof = True
                break
            buf.extend(piece)
        return len(buf) >= need

    consumed = 0
    while True:
        head_end = buf.find(b"\r\n\r\n")
        while head_end < 0 and not eof:
            _fill(len(buf) + chunk)
            head_end = buf.find(b"\r\n\r\n")
        if head_end < 0:
            if not buf:
                return  # clean EOF on a record boundary
            if strict:
                raise ValueError(
                    f"{name}: unterminated header block at {consumed}"
                )
            return
        parsed = _parse_header(name, bytes(buf[:head_end]), consumed, strict)
        if parsed is None:
            return
        hdr, clen, lsn = parsed
        need = head_end + 4 + clen + 4
        if not _fill(need) or bytes(buf[need - 4 : need]) != b"\r\n\r\n":
            if strict:
                raise ValueError(
                    f"{name}: truncated record at {consumed} "
                    f"(declared {clen} bytes)"
                )
            return
        yield (
            hdr.get("warc-target-uri"),
            lsn,
            hdr.get("warc-date"),
            hdr.get("x-change-op"),
            hdr.get("x-lang"),
            bytes(buf[head_end + 4 : head_end + 4 + clen]),
        )
        del buf[:need]
        consumed += need


def parse_warc_segments(
    segments: DataFrame, strict: bool = True
) -> DataFrame:
    """WARC segments (segment_id, blob binary) → typed record rows.

    Arrow-batched ``mapInPandas``: each task walks whole segments; the
    ``warc_date`` column is the raw ISO-8601 header string — cast with
    :func:`warc_date_to_ts` (kept separate so the parse stage stays a
    pure byte walk and the cast stays JVM-side codegen)."""
    cols = ["segment_id", "url", "lsn", "warc_date", "op", "lang", "html"]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for seg_id, blob in zip(pdf["segment_id"], pdf["blob"])
                for rec in _walk_segment(int(seg_id), bytes(blob), strict)
            ]
            yield pd.DataFrame(rows, columns=cols)

    return segments.mapInPandas(_parse, schema=PARSED_SCHEMA)


FILE_PARSED_SCHEMA = (
    "url string, lsn bigint, warc_date string, op string, lang string, "
    "html binary"
)


def parse_warc_files(
    paths: DataFrame,
    strict: bool = True,
    path_col: str = "wal_path",
    rows_per_batch: int = 8192,
) -> DataFrame:
    """WARC segment PATHS → typed record rows, streaming each file.

    The scale path for archive-size segments: each task opens its files
    and walks them with the buffered O(chunk)-memory walker
    (:func:`_walk_file`), yielding Arrow batches of ``rows_per_batch``
    rows — a 1 GB Common Crawl segment never materializes as a value
    anywhere in the plan (binaryFile's whole-content cell would pass it
    through UnsafeRow + Arrow copies and OOM a shared heap at task
    concurrency). Parallelism = file count: repartition the path list
    to spread segments across executors."""
    cols = ["url", "lsn", "warc_date", "op", "lang", "html"]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            for p in pdf[path_col]:
                local = p[len("file:"):] if str(p).startswith("file:") else str(p)
                with open(local, "rb") as fh:
                    for rec in _walk_file(local, fh, strict):
                        rows.append(rec)
                        if len(rows) >= rows_per_batch:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return paths.mapInPandas(_parse, FILE_PARSED_SCHEMA)


def warc_date_to_ts(col: str = "warc_date") -> F.Column:
    """ISO-8601 WARC-Date header string → timestamp (microsecond-exact)."""
    return F.to_timestamp(F.col(col), _TS_FMT)
