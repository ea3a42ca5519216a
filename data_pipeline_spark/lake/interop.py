"""External-reader interop: consume a pinned LakeTable snapshot from any
engine that can read parquet — no Spark, no engine code on the read side.

The lakehouse promise Iceberg/Delta make is that the TABLE, not the engine,
owns the data: external engines read a consistent snapshot straight from
storage given (a) the file list and (b) the merge semantics. This module
emits both, in three forms:

- :func:`reader_sql` — one self-contained ANSI-flavored SQL statement
  (DuckDB dialect for list literals) that reproduces ``LakeTable.read()``
  for a pinned snapshot: schema-version alignment (missing columns → typed
  NULL, widened → cast), merge-on-read LWW collapse scoped to delta-bearing
  buckets, tombstone filtering. Point a warehouse at the parquet and run it.
- :func:`write_symlink_manifest` — the Delta/Athena
  ``_symlink_format_manifest`` shape: one text file listing the snapshot's
  live data files, for engines that take file lists rather than SQL.
- :func:`scan_spec` — an engine-neutral JSON description (files, schema,
  key/order columns, delta buckets) for anything programmatic.

Exactness contract: external reads are byte-equivalent to
``LakeTable.read()`` whenever the feed contract held (no two change events
tied on (key, order) — ``quality_gate`` counts violations). Rows tied on
the order column resolve by a Spark-side xxhash64 row fingerprint that
portable SQL cannot reproduce; compaction materializes Spark's winner, so
FULLY COMPACTED snapshots are byte-exact even in the presence of past
ties. This mirrors the reference's register-for-external-consumers step
(items are queryable by external catalog clients once registered,
run_ingest_register.py:67-161): the table is the interface, not the
pipeline that wrote it.
"""

from __future__ import annotations

import os

from data_pipeline_spark.lake.table import (
    LINEAGE_COL,
    TOMBSTONE_COL,
    LakeTable,
    Snapshot,
)

# Spark DDL type → ANSI/DuckDB type. Extend as the engine's schema
# vocabulary grows; unknown types fail loudly rather than mis-cast.
_DDL_TO_SQL = {
    "string": "VARCHAR",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BLOB",
    "boolean": "BOOLEAN",
    "double": "DOUBLE",
    "float": "FLOAT",
}


def _sql_type(ddl: str) -> str:
    try:
        return _DDL_TO_SQL[ddl.lower()]
    except KeyError:
        raise ValueError(
            f"no portable SQL type mapping for Spark DDL type {ddl!r}"
        ) from None


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def _sql_lit(v) -> str:
    """Portable SQL literal for an initial-default scalar."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _read_block(
    table: LakeTable,
    snap: Snapshot,
    files: list[str],
    sv: int,
    cur_fields: list[tuple[str, str]],
    with_lineage: bool = False,
) -> str:
    """One SELECT over files written at schema version ``sv``, aligned to
    the current field list (absent-then columns → typed NULL; widened
    columns → cast). All writers normalize the tombstone column in
    (lake/table.py _normalize), so ``__deleted`` is always present."""
    all_ids, _ = table._all_field_ids(snap)
    tgt_ids = all_ids[str(snap.schema_version)]
    src_by_id = {i: n for n, i in all_ids[str(sv)].items()}
    have = {n for n, _ in table.schema_fields(snap, sv)}

    dflts = table.field_defaults(snap)

    def _src(n: str) -> str | None:
        # field-ID alignment, mirroring LakeTable.read(): renamed columns
        # read old files under their then-name; re-added names (fresh id)
        # read their INITIAL default (else NULL) from pre-add files.
        s = src_by_id.get(tgt_ids.get(n))
        return s if s in have else None

    def _absent(n: str, d: str) -> str:
        if n in dflts:
            return f"CAST({_sql_lit(dflts[n])} AS {_sql_type(d)})"
        return f"CAST(NULL AS {_sql_type(d)})"

    casts = [
        (
            f"CAST({_q(_src(n))} AS {_sql_type(d)}) AS {_q(n)}"
            if _src(n) is not None
            else f"{_absent(n, d)} AS {_q(n)}"
        )
        for n, d in cur_fields
    ]
    casts.append(
        f"COALESCE({_q(TOMBSTONE_COL)}, FALSE) AS {_q(TOMBSTONE_COL)}"
    )
    opts = ""
    if with_lineage:
        # lineage-enabled tables stamp the hidden column on every write;
        # union_by_name tolerates any pre-enablement stragglers (their
        # rows adopt their own order value, same as LakeTable.read)
        casts.append(
            f"COALESCE({_q(LINEAGE_COL)}, "
            f"CAST({_q(snap.order_col)} AS BIGINT)) AS {_q(LINEAGE_COL)}"
        )
        opts = ", union_by_name=true"
    file_list = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    return (
        "SELECT " + ", ".join(casts)
        + f" FROM read_parquet([{file_list}]{opts})"
    )


def reader_sql(
    table: LakeTable,
    snap: Snapshot | None = None,
    include_tombstones: bool = False,
    buckets: set[int] | None = None,
    with_lineage: bool = False,
) -> str:
    """SQL text reproducing ``table.read(buckets=..., snap=...)`` for an
    external engine, against the snapshot's parquet files directly.

    The statement unions one aligned SELECT per (schema version ×
    base/delta) file group; rows from buckets that retained delta files
    pass through a ``row_number() OVER (PARTITION BY key ORDER BY order
    DESC) = 1`` collapse — the same delta-scoped LWW ``read()`` performs —
    while compacted buckets' rows (already one winner per key) union
    through collapse-free. Tombstones are filtered unless
    ``include_tombstones`` (then surfaced with the ``__deleted`` flag,
    matching ``read(include_tombstones=True)``).

    The row_number subquery form (rather than QUALIFY) keeps the text
    runnable on DuckDB, Trino, BigQuery, and Snowflake alike; only the
    ``read_parquet([...])`` table function is dialect-specific.

    ``with_lineage=True`` (requires the ``lineage=true`` table property)
    appends the ``_first_lsn`` row-lineage column, reproducing
    ``read(with_lineage=True)``: compacted buckets read the persisted
    value; delta-bearing buckets derive it with the same fence-and-min
    fold the engine runs (CTEs over the delta union). Exact for tables
    that enabled lineage at creation; a mid-life-enabled table is exact
    after its first full compaction (pre-enablement files lack the
    physical column).
    """
    snap = snap or table.current()
    if with_lineage and not table.lineage_enabled(snap):
        raise ValueError(
            "row lineage needs the lineage=true table property"
        )
    groups, delta_paths = table._select_files(
        snap, buckets=buckets, distributed=False
    )
    cur_fields = table.schema_fields(snap)
    out_cols = [_q(n) for n, _ in cur_fields]
    if include_tombstones:
        out_cols.append(_q(TOMBSTONE_COL))
    if with_lineage:
        out_cols.append(_q(LINEAGE_COL))

    base_blocks: list[str] = []
    delta_blocks: list[str] = []
    for sv in sorted(groups):
        b_files = sorted(f for f in groups[sv] if f not in delta_paths)
        d_files = sorted(f for f in groups[sv] if f in delta_paths)
        if b_files:
            base_blocks.append(
                _read_block(table, snap, b_files, sv, cur_fields,
                            with_lineage)
            )
        if d_files:
            delta_blocks.append(
                _read_block(table, snap, d_files, sv, cur_fields,
                            with_lineage)
            )

    live = (
        ""
        if include_tombstones
        else f" WHERE NOT {_q(TOMBSTONE_COL)}"
    )
    ctes: list[str] = []
    parts: list[str] = []
    if base_blocks:
        base_union = "\nUNION ALL\n".join(base_blocks)
        parts.append(
            f"SELECT {', '.join(out_cols)} FROM (\n{base_union}\n) lake_base"
            + live
        )
    if delta_blocks:
        delta_union = "\nUNION ALL\n".join(delta_blocks)
        key, order = _q(snap.key), _q(snap.order_col)
        if with_lineage:
            # the engine's read-side lineage fold, verbatim in SQL: max
            # tombstone fence per key, min stamped first-lsn above it;
            # the winner's own stamp is overridden by the fold exactly
            # as LakeTable.read does
            ctes.append(f"lake_delta AS (\n{delta_union}\n)")
            ctes.append(
                f"lake_fence AS (SELECT {key}, max(CASE WHEN "
                f"{_q(TOMBSTONE_COL)} THEN {order} END) AS __t "
                f"FROM lake_delta GROUP BY {key})"
            )
            ctes.append(
                f"lake_lin AS (SELECT d.{key}, min(d.{_q(LINEAGE_COL)}) "
                f"AS {_q(LINEAGE_COL)} FROM lake_delta d "
                f"JOIN lake_fence f USING ({key}) "
                f"WHERE NOT d.{_q(TOMBSTONE_COL)} "
                f"AND (f.__t IS NULL OR d.{order} > f.__t) "
                f"GROUP BY d.{key})"
            )
            inner = [c for c in out_cols if c != _q(LINEAGE_COL)]
            if _q(TOMBSTONE_COL) not in inner:
                # the outer live-filter needs the flag even when the
                # caller's projection drops it
                inner.append(_q(TOMBSTONE_COL))
            win_cols = ", ".join(f"w.{c}" for c in inner)
            collapse = (
                f"SELECT {win_cols}, lake_lin.{_q(LINEAGE_COL)} FROM (\n"
                f"SELECT * FROM (SELECT lake_delta.*, row_number() OVER "
                f"(PARTITION BY {key} ORDER BY {order} DESC) AS __rn "
                f"FROM lake_delta) lake_ranked WHERE __rn = 1\n"
                f") w LEFT JOIN lake_lin USING ({key})"
            )
            parts.append(
                f"SELECT {', '.join(out_cols)} FROM (\n{collapse}\n) "
                f"lake_winners" + live
            )
        else:
            collapse = (
                f"SELECT * FROM (\n"
                f"SELECT lake_delta.*, row_number() OVER "
                f"(PARTITION BY {key} ORDER BY {order} DESC) AS __rn\n"
                f"FROM (\n{delta_union}\n) lake_delta\n) lake_ranked "
                f"WHERE __rn = 1"
            )
            parts.append(
                f"SELECT {', '.join(out_cols)} FROM (\n{collapse}\n) "
                f"lake_winners" + live
            )
    if not parts:
        null_row = ", ".join(
            f"CAST(NULL AS {_sql_type(d)}) AS {_q(n)}" for n, d in cur_fields
        )
        if include_tombstones:
            null_row += f", CAST(NULL AS BOOLEAN) AS {_q(TOMBSTONE_COL)}"
        if with_lineage:
            null_row += f", CAST(NULL AS BIGINT) AS {_q(LINEAGE_COL)}"
        return f"SELECT {null_row} WHERE 1 = 0"
    body = "\nUNION ALL\n".join(parts)
    if ctes:
        return "WITH " + ",\n".join(ctes) + "\n" + body
    return body


def write_symlink_manifest(
    table: LakeTable, snap: Snapshot | None = None
) -> str:
    """Write ``_external/manifest-v{version}.txt`` — one absolute data-file
    path per line for the pinned snapshot (the Delta
    ``_symlink_format_manifest`` / Athena shape) — and return its path.
    Written atomically (tmp + rename) so a concurrent external reader
    never sees a torn list; the name is version-pinned so re-export of the
    same snapshot is idempotent and distinct snapshots never clobber."""
    snap = snap or table.current()
    groups, _ = table._select_files(snap, distributed=False)
    paths = sorted(p for files in groups.values() for p in files)
    out_dir = os.path.join(table.root, "_external")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"manifest-v{snap.version}.txt")
    tmp = out + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(paths) + ("\n" if paths else ""))
    os.replace(tmp, out)
    return out


def scan_spec(table: LakeTable, snap: Snapshot | None = None) -> dict:
    """Engine-neutral snapshot description: everything a programmatic
    external reader needs to reproduce ``read()`` (files grouped by schema
    version and base/delta kind, current schema, key/order/tombstone
    columns, and the LWW rule). JSON-serializable by construction."""
    snap = snap or table.current()
    groups, delta_paths = table._select_files(snap, distributed=False)
    all_ids, _ = table._all_field_ids(snap)
    dflts = table.field_defaults(snap)

    def _schema(sv: int) -> list[dict]:
        ids = all_ids[str(sv)]
        out = []
        for n, d in table.schema_fields(snap, sv):
            e: dict = {"name": n, "type": d, "field_id": ids[n]}
            if sv == snap.schema_version and n in dflts:
                e["initial_default"] = dflts[n]
            out.append(e)
        return out

    return {
        "table_root": table.root,
        "snapshot_version": snap.version,
        "key": snap.key,
        "order_col": snap.order_col,
        "tombstone_col": TOMBSTONE_COL,
        "schema": _schema(snap.schema_version),
        "file_groups": [
            {
                "schema_version": sv,
                "schema": _schema(sv),
                "base_files": sorted(
                    f for f in files if f not in delta_paths
                ),
                "delta_files": sorted(f for f in files if f in delta_paths),
            }
            for sv, files in sorted(groups.items())
        ],
        "merge_rule": (
            "per key keep the row with max(order_col) across ALL of the "
            "key's bucket files when that bucket has delta_files (base "
            "buckets are pre-collapsed); drop rows where tombstone_col. "
            "Align a file's columns to the current schema by FIELD_ID "
            "(not name); a current field id absent from the file's "
            "schema reads initial_default if present, else NULL"
        ),
    }


def duckdb_view_sql(
    table: LakeTable,
    view_name: str,
    snap: Snapshot | None = None,
) -> str:
    """Convenience: a CREATE OR REPLACE VIEW statement pinning
    ``view_name`` to the snapshot in a DuckDB catalog."""
    body = reader_sql(table, snap=snap)
    return f"CREATE OR REPLACE VIEW {_q(view_name)} AS\n{body}"
