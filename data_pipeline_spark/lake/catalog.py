"""Named-table catalog: one directory of lake tables plus a SQL front
door (restricted DDL + the existing DML compiler + Spark SELECT).

The reference registers every produced object in a central pgSTAC
catalog and resolves readers through it (reference:
scripts/register_v1.py:96-155, operator-tools/_migrate_catalog/
runner.py:31-54). This engine's catalog is deliberately thinner — a
directory of tables where each table's own snapshot head (``_CURRENT``,
CAS-protected) is the source of truth:

* **No central metadata file.** Listing is one ``listdir``; creating,
  dropping, or committing to one table never contends with writers of
  another (the pgSTAC analog serializes everything through one
  Postgres). Table creation inherits the snapshot CAS's link(2)
  exclusivity, so two racing ``CREATE TABLE``\\ s of the same name
  produce one winner and one loud error, never a torn table.
* **Reads stay JVM-side.** ``register_views`` / ``sql`` resolve each
  table to its ordinary pruned-parquet read plan (``LakeTable.read``),
  so a catalog SELECT is exactly as scan-efficient as a direct read —
  the catalog adds name resolution, not a data path.
* **DDL is metadata-only.** CREATE/ALTER map onto
  :meth:`LakeTable.create` / :meth:`evolve_schema` /
  :meth:`update_props` — O(1) snapshot commits, never a data rewrite,
  idempotent on ``commit_key`` like every other commit in the engine.

Grammar (the restricted intersection a Delta/Iceberg/Paimon user
already writes; anything outside it refuses loudly):

    CREATE TABLE t (c TYPE [PRIMARY KEY], ...)
        [PARTITIONED BY (BUCKET(<n>, <keycol>))]
        [TBLPROPERTIES ('k'='v', ...)]
    ALTER TABLE t ADD COLUMN[S] c TYPE [DEFAULT <lit>][, ...]
    ALTER TABLE t RENAME COLUMN a TO b
    ALTER TABLE t DROP COLUMN c
    ALTER TABLE t ALTER COLUMN c TYPE <newtype>
    ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...)
    ALTER TABLE t RENAME TO u
    DROP TABLE t [PURGE]
    SHOW TABLES | SHOW TBLPROPERTIES t | DESCRIBE [TABLE] t

Read-side sugar inside SELECT/WITH: ``t$files`` / ``t$partitions`` /
``t$history`` expose the Iceberg-style metadata tables (manifest- and
snapshot-derived, zero data IO), and ``t VERSION AS OF n`` is
Delta-style time travel (a ``read_version(n)`` view).

The key column comes from the inline ``PRIMARY KEY`` marker (Paimon's
shape); the LWW order column from TBLPROPERTIES ``'sequence.field'``
(Paimon's name for it), defaulting to ``lsn`` when present. DML
(MERGE/INSERT/UPDATE/DELETE) routes through :func:`sql_merge.dml_sql`;
SELECT/WITH registers the referenced tables as snapshot-pinned temp
views and runs through ``spark.sql``.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_spark.lake.table import CURRENT_FILE, LakeTable

_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_TRASH = ".trash"

_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<name>\w+)\s*\(\s*(?P<cols>.+?)\s*\)\s*"
    r"(?:PARTITIONED\s+BY\s*\(\s*BUCKET\s*\(\s*(?P<nb>\d+)\s*,\s*"
    r"(?P<bcol>\w+)\s*\)\s*\)\s*)?"
    r"(?:TBLPROPERTIES\s*\(\s*(?P<props>.+?)\s*\)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<name>\w+)\s*(?P<purge>PURGE)?\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>\w+)\s+(?P<rest>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_COLS = re.compile(r"^ADD\s+COLUMNS?\s+(?P<cols>.+)$", re.IGNORECASE | re.DOTALL)
_RENAME_COL = re.compile(
    r"^RENAME\s+COLUMN\s+(?P<old>\w+)\s+TO\s+(?P<new>\w+)$", re.IGNORECASE
)
_DROP_COL = re.compile(r"^DROP\s+COLUMN\s+(?P<col>\w+)$", re.IGNORECASE)
_ALTER_COL = re.compile(
    r"^ALTER\s+COLUMN\s+(?P<col>\w+)\s+TYPE\s+(?P<type>[\w()<>, ]+)$",
    re.IGNORECASE,
)
_SET_PROPS = re.compile(
    r"^SET\s+TBLPROPERTIES\s*\(\s*(?P<props>.+?)\s*\)$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_TBL = re.compile(r"^RENAME\s+TO\s+(?P<new>\w+)$", re.IGNORECASE)
# Property pairs use standard SQL single-quote escaping ('' = one quote):
# generated-column and CHECK props store SQL text that routinely contains
# quotes (split_part(url, '/', 3); lang IN ('en','de')), so both the
# emitter (show_create_table) and this parser must round-trip them.
_PROP_PAIR = re.compile(
    r"'(?P<k>(?:[^']|'')+)'\s*=\s*'(?P<v>(?:[^']|'')*)'"
)


def _q(v: str) -> str:
    """Quote one property atom for DDL emission."""
    return "'" + str(v).replace("'", "''") + "'"


def _unq(v: str) -> str:
    return v.replace("''", "'")


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parens/quotes (column and property lists)."""
    out, depth, q, cur = [], 0, None, []
    for ch in s:
        if q is not None:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch in "(<":
            depth += 1
            cur.append(ch)
        elif ch in ")>":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _parse_props(txt: str | None) -> dict[str, str]:
    return (
        {
            _unq(m.group("k")): _unq(m.group("v"))
            for m in _PROP_PAIR.finditer(txt)
        }
        if txt
        else {}
    )


def _parse_default(lit: str) -> Any:
    """A DDL DEFAULT literal: quoted string, number, or NULL/bool."""
    lit = lit.strip()
    if lit[:1] in "'\"" and lit[-1:] == lit[:1]:
        return lit[1:-1]
    low = lit.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(lit)
    except ValueError:
        return float(lit)


class Catalog:
    """A directory of named lake tables with a SQL front door."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # One hermetic child session per Catalog, REUSED across SELECT /
        # EXPLAIN statements (ADVICE r4: a fresh newSession() per SELECT
        # accumulates JVM SessionState a hot query loop never releases).
        # Guarded by a lock: concurrent sql() calls on the SAME Catalog
        # object fall back to a throwaway child instead of racing the
        # shared namespace.
        self._hermetic = None
        import threading

        self._hermetic_lock = threading.Lock()
        os.makedirs(root, exist_ok=True)

    def _hermetic_child(self):
        """The cached hermetic child, with its temp-view namespace wiped
        and the parent's carried confs refreshed. Safe to reuse between
        statements because Spark ANALYZES a statement eagerly at sql()
        time — temp views are inlined into the returned DataFrame's
        resolved plan, so dropping them before the next statement cannot
        break a previously returned (even uncollected) result."""
        from data_pipeline_spark.session import _CARRY_CONF, hermetic_session

        if self._hermetic is None:
            self._hermetic = hermetic_session(self.spark)
        else:
            for t in self._hermetic.catalog.listTables():
                if t.isTemporary and not t.namespace:
                    self._hermetic.catalog.dropTempView(t.name)
            for k in _CARRY_CONF:
                try:
                    v = self.spark.conf.get(k)
                except Exception:
                    continue
                if v is not None:
                    self._hermetic.conf.set(k, v)
        return self._hermetic

    # -- name resolution -----------------------------------------------------

    def _path(self, name: str) -> str:
        if not _NAME.match(name or ""):
            raise ValueError(f"bad table name {name!r}")
        return os.path.join(self.root, name)

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), CURRENT_FILE))

    def table_names(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.root)
            if _NAME.match(n)
            and os.path.exists(os.path.join(self.root, n, CURRENT_FILE))
        )

    def load(self, name: str) -> LakeTable:
        if not self.table_exists(name):
            raise KeyError(f"no such table {name!r}")
        return LakeTable(self.spark, self._path(name))

    # -- lifecycle -------------------------------------------------------------

    def create_table(
        self,
        name: str,
        schema: list[tuple[str, str]],
        key: str = "url",
        n_buckets: int = 64,
        order_col: str = "lsn",
        props: dict[str, Any] | None = None,
    ) -> LakeTable:
        if self.table_exists(name):
            raise FileExistsError(f"table {name!r} already exists")
        # LakeTable.create's v0 commit inherits link(2) exclusivity, so a
        # racing creator of the same name fails loudly there.
        return LakeTable.create(
            self.spark, self._path(name), schema, key, n_buckets,
            order_col=order_col, props=props,
        )

    def drop_table(self, name: str, purge: bool = False) -> str | None:
        """Without ``purge`` the table moves to the catalog's trash
        (rename — O(1), undoable by hand); with it the files are gone."""
        path = self._path(name)
        if not self.table_exists(name):
            raise KeyError(f"no such table {name!r}")
        if purge:
            shutil.rmtree(path)
            return None
        trash_dir = os.path.join(self.root, _TRASH)
        os.makedirs(trash_dir, exist_ok=True)
        dest = os.path.join(trash_dir, f"{name}-{uuid.uuid4().hex[:8]}")
        os.rename(path, dest)
        return dest

    def rename_table(self, old: str, new: str) -> None:
        if not self.table_exists(old):
            raise KeyError(f"no such table {old!r}")
        if self.table_exists(new) or os.path.exists(self._path(new)):
            raise FileExistsError(f"table {new!r} already exists")
        os.rename(self._path(old), self._path(new))

    # -- reads -----------------------------------------------------------------

    def register_views(self, names: list[str] | None = None) -> list[str]:
        """Register each table's CURRENT state as a Spark temp view
        (snapshot-pinned at call time — re-register to see later
        commits). Returns the registered names."""
        names = self.table_names() if names is None else names
        for n in names:
            self.load(n).read().createOrReplaceTempView(n)
        return list(names)

    def _referenced(self, statement: str) -> list[str]:
        toks = set(re.findall(r"\b\w+\b", statement))
        return [n for n in self.table_names() if n in toks]

    _META = re.compile(r"`?(\w+)\$(files|partitions|history)`?")
    _ASOF = re.compile(
        r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)\b", re.IGNORECASE
    )
    _ASOF_TAG = re.compile(
        r"\b(\w+)\s+VERSION\s+AS\s+OF\s+'(\w+)'", re.IGNORECASE
    )
    _CHANGES = re.compile(
        r"table_changes\(\s*'(\w+)'\s*,\s*(\d+)\s*,\s*(\d+)\s*\)",
        re.IGNORECASE,
    )

    def _history_df(self, table: LakeTable) -> DataFrame:
        rows = [
            (
                s.version,
                str(s.summary.get("op", "")),
                s.schema_version,
                len(s.commits),
            )
            for s in table.snapshot_log()
        ]
        return self.spark.createDataFrame(
            rows, "version bigint, op string, schema_version bigint, "
            "commits bigint",
        )

    def _rewrite_reads(self, statement: str) -> str:
        """Expand the two read-side sugars before ``spark.sql``:

        * ``t$files`` / ``t$partitions`` / ``t$history`` — Iceberg-style
          metadata tables (manifest/snapshot-derived, no data IO) —
          register as views and substitute a legal identifier.
        * ``t VERSION AS OF n`` — Delta-style time travel — registers a
          ``read_version(n)`` view (snapshot-pinned by construction).
        """
        names = set(self.table_names())

        def _meta(m: re.Match) -> str:
            name, kind = m.group(1), m.group(2)
            if name not in names:
                return m.group(0)
            t = self.load(name)
            df = (
                t.files() if kind == "files"
                else t.partitions() if kind == "partitions"
                else self._history_df(t)
            )
            view = f"{name}__{kind}"
            df.createOrReplaceTempView(view)
            return view

        def _asof(m: re.Match) -> str:
            name, v = m.group(1), int(m.group(2))
            if name not in names:
                return m.group(0)
            view = f"{name}__v{v}"
            self.load(name).read_version(v).createOrReplaceTempView(view)
            return view

        def _asof_tag(m: re.Match) -> str:
            name, tag = m.group(1), m.group(2)
            if name not in names:
                return m.group(0)
            view = f"{name}__tag_{tag}"
            self.load(name).read_tag(tag).createOrReplaceTempView(view)
            return view

        def _changes(m: re.Match) -> str:
            # Delta's table_changes('t', v1, v2) CDF sugar — the net
            # change feed between two versions as a readable relation.
            name, v1, v2 = m.group(1), int(m.group(2)), int(m.group(3))
            if name not in names:
                return m.group(0)
            view = f"{name}__ch_{v1}_{v2}"
            self.load(name).changes_between(v1, v2).createOrReplaceTempView(
                view
            )
            return view

        return self._CHANGES.sub(
            _changes,
            self._ASOF.sub(
                _asof,
                self._ASOF_TAG.sub(_asof_tag, self._META.sub(_meta, statement)),
            ),
        )

    # -- the SQL front door ------------------------------------------------------

    def _metadata_aggregate(
        self, statement: str, sources=None, explain: bool = False
    ):
        """Route the two classic whole-table aggregates to the metadata
        plane (the Iceberg count/min-max pushdown a catalog user gets
        for free): ``SELECT count(*) FROM t`` → :meth:`LakeTable.
        count_rows` (manifest live_rows sums) and ``SELECT min(c),
        max(c) FROM t`` (either or both, one column) → :meth:`LakeTable.
        agg_bounds` (manifest footer bounds). Exact single-table,
        no-WHERE forms only; anything else — and any table where the
        metadata plane refuses (merge modes, masks, row filters) or
        would scan anyway (string columns, delta-bearing fence columns)
        — falls through to the ordinary snapshot-pinned scan, which
        returns the identical answer. Result schemas match what
        ``spark.sql`` would produce (same default aliases and types;
        timestamps convert back from the stats' epoch-micro unit).

        A FROM name present in ``sources`` always falls through: the
        scan path lets a caller-supplied DataFrame SHADOW a same-named
        catalog table (sources register last), so the fast path must not
        answer from the table the statement would not read."""

        def _eligible(name: str) -> bool:
            return name not in (sources or {}) and self.table_exists(name)

        m = re.match(
            r"\s*SELECT\s+COUNT\s*\(\s*\*\s*\)\s*(?:AS\s+(?P<a>\w+))?\s*"
            r"FROM\s+(?P<t>\w+)\s*;?\s*$",
            statement,
            re.IGNORECASE,
        )
        if m and _eligible(m.group("t")):
            try:
                plan = self.load(m.group("t")).count_rows(with_plan=True)
            except ValueError:
                return None
            if explain:
                return (
                    "access path: metadata (count) — manifest live_rows "
                    f"sums over {len(plan['metadata_buckets'])} bucket(s); "
                    f"delta-tail scan over "
                    f"{len(plan['scanned_buckets'])} bucket(s) "
                    f"{plan['scanned_buckets']}"
                )
            return self.spark.createDataFrame(
                [(plan["count"],)],
                f"`{m.group('a') or 'count(1)'}` bigint",
            )
        agg = r"(?P<f{i}>MIN|MAX)\s*\(\s*(?P<c{i}>\w+)\s*\)\s*(?:AS\s+(?P<a{i}>\w+))?"
        m = re.match(
            r"\s*SELECT\s+" + agg.format(i=1)
            + r"(?:\s*,\s*" + agg.format(i=2) + r")?"
            + r"\s*FROM\s+(?P<t>\w+)\s*;?\s*$",
            statement,
            re.IGNORECASE,
        )
        if not m or not _eligible(m.group("t")):
            return None
        cols = {m.group("c1")}
        if m.group("f2"):
            cols.add(m.group("c2"))
        if len(cols) != 1:
            return None
        (col,) = cols
        table = self.load(m.group("t"))
        snap = table.current()
        fields = dict(table.schema_fields(snap))
        ddl = fields.get(col, "").lower()
        if ddl not in ("bigint", "timestamp"):
            return None  # strings would scan anyway — no metadata win
        try:
            plan = table.agg_bounds(col, snap=snap, with_plan=True)
        except (ValueError, KeyError):
            return None
        if explain:
            return (
                f"access path: metadata (min/max of {col}) — manifest "
                f"footer bounds over {len(plan['metadata_buckets'])} "
                f"bucket(s); pruned scan over "
                f"{len(plan['scanned_buckets'])} bucket(s) "
                f"{plan['scanned_buckets']}"
            )
        vals = {"MIN": plan["min"], "MAX": plan["max"]}
        out_cols, out_vals = [], []
        for i in (1, 2):
            if not m.group(f"f{i}"):
                continue
            f = m.group(f"f{i}").upper()
            name = m.group(f"a{i}") or f"{f.lower()}({m.group(f'c{i}')})"
            out_cols.append(f"`{name}` {'timestamp' if ddl == 'timestamp' else 'bigint'}")
            v = vals[f]
            if ddl == "timestamp" and v is not None:
                import datetime

                v = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                    microseconds=v
                )
            out_vals.append(v)
        return self.spark.createDataFrame(
            [tuple(out_vals)], ", ".join(out_cols)
        )

    def sql(
        self,
        statement: str,
        commit_key: str | None = None,
        sources: dict[str, DataFrame] | None = None,
        **kw,
    ):
        """Execute one statement: restricted DDL (metadata commits), DML
        (MERGE/INSERT/UPDATE/DELETE via :func:`sql_merge.dml_sql`,
        ``commit_key`` required), or SELECT/WITH (referenced catalog
        tables auto-register as snapshot-pinned views, then
        ``spark.sql``; returns the DataFrame).

        .. note:: breaking change (round 4): SELECT/WITH statements run
           HERMETICALLY — they resolve catalog tables plus whatever is
           passed via ``sources``, and NOTHING else. A temp view
           registered on the caller's own session is no longer visible;
           pass it as ``sources={"name": df}`` instead. This is what
           makes two interleaved catalog SELECTs (or a SELECT racing a
           DML) unable to read each other's relations."""
        head = re.match(r"\s*(\w+)", statement)
        verb = (head.group(1) if head else "").upper()
        if verb in ("SELECT", "WITH"):
            fast = self._metadata_aggregate(statement, sources)
            if fast is not None:
                return fast
            # Hermetic execution: the statement runs on a CHILD session
            # (own empty temp-view namespace) where the referenced
            # catalog tables resolve to snapshot-pinned reads built
            # DIRECTLY on that session, and caller-supplied ``sources``
            # are bridged in (shadowing same-named tables, registered
            # last). Nothing is registered on — and nothing can be
            # shadowed by — the caller's session, so two interleaved
            # catalog SELECTs, or a SELECT racing a DML whose sources
            # reuse a table name, can never read each other's relation
            # (round-3's cdc_catalog_sql driver mismatch). Reference
            # analog: per-collection namespace isolation,
            # run_ingest_register.py:38-48.
            from data_pipeline_spark.session import (
                bridge_views,
                hermetic_session,
            )

            # Reuse ONE child per Catalog (wiped between statements) so a
            # hot query loop doesn't accumulate JVM SessionState; if
            # another thread holds the child, fall back to a throwaway
            # session rather than racing its namespace.
            if self._hermetic_lock.acquire(blocking=False):
                try:
                    child = self._hermetic_child()
                    exec_cat = Catalog(child, self.root)
                    statement = exec_cat._rewrite_reads(statement)
                    exec_cat.register_views(exec_cat._referenced(statement))
                    bridge_views(child, sources or {})
                    return child.sql(statement)
                finally:
                    self._hermetic_lock.release()
            exec_cat = Catalog(hermetic_session(self.spark), self.root)
            statement = exec_cat._rewrite_reads(statement)
            exec_cat.register_views(exec_cat._referenced(statement))
            bridge_views(exec_cat.spark, sources or {})
            return exec_cat.spark.sql(statement)
        if verb == "EXPLAIN":
            return self._explain_sql(statement, sources)
        if verb == "SHOW":
            mc = re.match(
                r"\s*SHOW\s+CREATE\s+TABLE\s+(?P<t>\w+)\s*;?\s*$",
                statement,
                re.IGNORECASE,
            )
            if mc:
                return self.spark.createDataFrame(
                    [(self.show_create_table(mc.group("t")),)],
                    "createtab_stmt string",
                )
            m = re.match(
                r"\s*SHOW\s+(?:TABLES|(?:TBLPROPERTIES\s+(?P<t>\w+)))\s*;?\s*$",
                statement,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError(
                    "unparseable SHOW — SHOW TABLES | SHOW CREATE TABLE "
                    "<t> | SHOW TBLPROPERTIES <t>"
                )
            if m.group("t"):
                props = self.load(m.group("t")).current().props
                return self.spark.createDataFrame(
                    [(k, str(v)) for k, v in sorted(props.items())],
                    "key string, value string",
                )
            return self.spark.createDataFrame(
                [(n,) for n in self.table_names()], "table_name string"
            )
        if verb == "DESCRIBE":
            m = re.match(
                r"\s*DESCRIBE\s+(?:TABLE\s+)?(?P<t>\w+)\s*;?\s*$",
                statement,
                re.IGNORECASE,
            )
            if not m:
                raise ValueError("unparseable DESCRIBE — DESCRIBE [TABLE] <t>")
            t = self.load(m.group("t"))
            snap = t.current()
            ids = t._all_field_ids(snap)[0][str(snap.schema_version)]
            defaults = {
                e[0]: e[3]
                for e in snap.schemas[str(snap.schema_version)]
                if len(e) > 3 and e[3] is not None
            }
            rows = [
                (
                    n,
                    d,
                    int(ids[n]),
                    "primary key" if n == snap.key
                    else "order" if n == snap.order_col
                    else "",
                    None if n not in defaults else str(defaults[n]),
                )
                for n, d in t.schema_fields(snap)
            ]
            return self.spark.createDataFrame(
                rows,
                "col_name string, data_type string, field_id int, "
                "role string, initial_default string",
            )
        if verb in ("MERGE", "INSERT", "UPDATE", "DELETE"):
            from data_pipeline_spark.sql_merge import dml_sql

            if commit_key is None:
                raise ValueError(f"{verb} needs a commit_key")
            tables = {n: self.load(n) for n in self._referenced(statement)}
            return dml_sql(statement, commit_key, tables, sources, **kw)
        if verb == "CREATE":
            if re.search(r"\bAS\s+SELECT\b", statement, re.IGNORECASE):
                return self._ctas_sql(statement, commit_key, sources)
            return self._create_sql(statement)
        if verb == "DROP":
            m = _DROP.match(statement)
            if not m:
                raise ValueError("unparseable DROP — DROP TABLE <t> [PURGE]")
            return self.drop_table(m.group("name"), purge=bool(m.group("purge")))
        if verb == "ALTER":
            return self._alter_sql(statement, commit_key)
        if verb == "OPTIMIZE":
            return self._optimize_sql(statement, commit_key)
        if verb == "VACUUM":
            m = re.match(
                r"\s*VACUUM\s+(?P<t>\w+)"
                r"(?:\s+RETAIN\s+(?P<h>\d+)\s+HOURS)?"
                r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
                statement, re.IGNORECASE,
            )
            if not m:
                raise ValueError(
                    "unparseable VACUUM — VACUUM <t> [RETAIN n HOURS] "
                    "[DRY RUN]"
                )
            return self.load(m.group("t")).vacuum(
                min_age_s=float(m.group("h") or 0) * 3600.0,
                dry_run=bool(m.group("dry")),
            )
        if verb == "CALL":
            return self._call_sql(statement, commit_key)
        raise ValueError(
            f"unsupported statement verb {verb!r} — SELECT/WITH, EXPLAIN, "
            "MERGE/INSERT/UPDATE/DELETE, CREATE/ALTER/DROP TABLE, "
            "SHOW TABLES/TBLPROPERTIES, DESCRIBE, OPTIMIZE, VACUUM, "
            "CALL only"
        )

    def _optimize_sql(self, statement: str, commit_key: str | None):
        """``OPTIMIZE <t> [ZORDER BY (c1, c2, ...)]`` — the Delta
        maintenance verb compiled onto the engine's mode-aware rewrite:
        LWW tables run the whole-row compaction (optionally z-order
        clustered); append merge-mode tables run the FILES-ONLY rewrite
        (their events must survive verbatim — maintenance.compact_append),
        and ZORDER on them refuses because a clustering rewrite is a
        whole-row operation. Idempotent on ``commit_key``."""
        m = re.match(
            r"\s*OPTIMIZE\s+(?P<t>\w+)"
            r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]+)\))?\s*;?\s*$",
            statement, re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "unparseable OPTIMIZE — OPTIMIZE <t> [ZORDER BY (cols)]"
            )
        if commit_key is None:
            raise ValueError("OPTIMIZE needs a commit_key")
        t = self.load(m.group("t"))
        cols = (
            [c.strip() for c in m.group("z").split(",")]
            if m.group("z") else None
        )
        if t.current().props.get("merge.mode", "lww") != "lww":
            if cols:
                raise ValueError(
                    "ZORDER is a whole-row clustering rewrite; append "
                    "merge-mode tables compact files-only"
                )
            from data_pipeline_spark.maintenance import compact_append

            return compact_append(t, commit_key)
        return t.compact(
            commit_key, cluster_by=cols, zorder=bool(cols), min_files=1
        )

    _CALL = re.compile(
        r"\s*CALL\s+(?P<proc>\w+)\s*\(\s*(?P<t>\w+)\s*"
        r"(?:,\s*(?P<args>[^)]*))?\)\s*;?\s*$",
        re.IGNORECASE,
    )

    def _call_sql(self, statement: str, commit_key: str | None):
        """Iceberg-style stored procedures over catalog tables:

        * ``CALL expire_snapshots(t [, keep_last => k])``
        * ``CALL rewrite_manifests(t [, max_chain => n])`` (commit_key)
        * ``CALL rollback_to_version(t, version => v)`` (commit_key)
        * ``CALL create_tag(t, name => 'x' [, version => v])`` /
          ``CALL remove_tag(t, name => 'x')``
        * ``CALL run_maintenance(t)`` — one policy-default bounded round
          (commit_key)

        Named args are ``name => integer`` or ``name => 'string'`` pairs
        (the Iceberg CALL convention); anything else refuses."""
        m = self._CALL.match(statement)
        if not m:
            raise ValueError(
                "unparseable CALL — CALL <proc>(<table> [, k => v, ...])"
            )
        args: dict[str, int | str] = {}
        for part in (m.group("args") or "").split(","):
            part = part.strip()
            if not part:
                continue
            am = re.match(r"(\w+)\s*=>\s*(?:(\d+)|'([^']*)')$", part)
            if not am:
                raise ValueError(f"unparseable CALL argument {part!r}")
            args[am.group(1)] = (
                int(am.group(2)) if am.group(2) is not None else am.group(3)
            )
        t = self.load(m.group("t"))
        proc = m.group("proc").lower()
        if proc == "expire_snapshots":
            known = set(args) - {"keep_last"}
            if known:
                raise ValueError(f"expire_snapshots: unknown args {known}")
            return t.expire_snapshots(keep_last=args.get("keep_last", 1))
        if proc == "rewrite_manifests":
            known = set(args) - {"max_chain"}
            if known:
                raise ValueError(f"rewrite_manifests: unknown args {known}")
            if commit_key is None:
                raise ValueError("rewrite_manifests needs a commit_key")
            return t.rewrite_manifests(
                commit_key, max_chain=args.get("max_chain", 1)
            )
        if proc in ("create_tag", "remove_tag"):
            known = set(args) - (
                {"name", "version"} if proc == "create_tag" else {"name"}
            )
            if known:
                raise ValueError(f"{proc}: unknown args {known}")
            name = args.get("name")
            if not isinstance(name, str):
                raise ValueError(f"{proc} needs name => 'tag'")
            if proc == "remove_tag":
                t.untag(name)
                return None
            version = args.get("version")
            if version is not None and not isinstance(version, int):
                raise ValueError("create_tag: version must be an integer")
            return t.tag(name, version)
        if proc == "rollback_to_version":
            known = set(args) - {"version"}
            if known:
                raise ValueError(f"rollback_to_version: unknown args {known}")
            if "version" not in args:
                raise ValueError("rollback_to_version needs version => n")
            if commit_key is None:
                raise ValueError("rollback_to_version needs a commit_key")
            return t.rollback_to(args["version"], commit_key)
        if proc == "run_maintenance":
            if args:
                raise ValueError(
                    "run_maintenance takes no CALL args — configure via "
                    "MaintenancePolicy in code"
                )
            if commit_key is None:
                raise ValueError("run_maintenance needs a commit_key")
            from data_pipeline_spark.maintenance import run_maintenance

            return run_maintenance(t, commit_key)
        raise ValueError(
            f"unknown procedure {proc!r} — expire_snapshots, "
            "rewrite_manifests, rollback_to_version, run_maintenance"
        )

    def _explain_sql(self, statement: str, sources=None) -> DataFrame:
        """``EXPLAIN <select>`` through the front door: SEE the access
        path the engine chose, before Spark's own plan. A
        metadata-routed aggregate reports which buckets answer from
        manifests vs the delta-tail scan; everything else reports the
        snapshot-pinned scan fall-through followed by Spark's
        ``EXPLAIN FORMATTED`` of the exact statement the SELECT path
        would execute (same rewrites, same hermetic resolution).
        Returns one row, column ``plan``.

        Reference analog: the explain-your-skips discipline of the
        migration stamper (operator-tools/_migrate_catalog/migrations/
        stamp_expires.py:119-142)."""
        # Strip the EXPLAIN verb + any Spark mode keyword, remembering
        # the mode so it passes through to the child's EXPLAIN (ADVICE
        # r4: `EXPLAIN EXTENDED SELECT ...` used to leave EXTENDED as
        # the inner verb and raise a misleading error).
        m = re.match(
            r"^\s*EXPLAIN\s+(?:(?P<mode>FORMATTED|EXTENDED|CODEGEN|COST"
            r"|ANALYZED)\s+)?",
            statement,
            flags=re.IGNORECASE,
        )
        mode = (m.group("mode") or "FORMATTED").upper()
        inner = statement[m.end():]
        ihead = re.match(r"\s*(\w+)", inner)
        iverb = (ihead.group(1) if ihead else "").upper()
        if iverb not in ("SELECT", "WITH"):
            raise ValueError(
                "EXPLAIN supports SELECT/WITH statements only"
            )
        fast = self._metadata_aggregate(inner, sources, explain=True)
        if fast is not None:
            return self.spark.createDataFrame([(fast,)], "plan string")
        from data_pipeline_spark.session import (
            bridge_views,
            hermetic_session,
        )

        if self._hermetic_lock.acquire(blocking=False):
            release = self._hermetic_lock.release
            child = self._hermetic_child()
        else:
            release = None
            child = hermetic_session(self.spark)
        try:
            exec_cat = Catalog(child, self.root)
            rewritten = exec_cat._rewrite_reads(inner)
            names = exec_cat.register_views(exec_cat._referenced(rewritten))
            bridge_views(child, sources or {})
            body = "\n".join(
                r[0]
                for r in child.sql(
                    f"EXPLAIN {mode} " + rewritten
                ).collect()
            )
        finally:
            if release is not None:
                release()
        header = (
            "access path: scan — snapshot-pinned pruned parquet read "
            f"over catalog table(s) {names}"
        )
        return self.spark.createDataFrame(
            [(header + "\n" + body,)], "plan string"
        )

    # -- DDL ---------------------------------------------------------------------

    def show_create_table(self, name: str) -> str:
        """Canonical DDL text that would recreate ``name``'s CURRENT
        shape through this catalog's own grammar (round-trippable by
        construction — the emitted text parses under ``_create_sql``).
        Emits columns with the PRIMARY KEY marker, the bucket spec, and
        TBLPROPERTIES including a non-default ``sequence.field``;
        internal bookkeeping props stay (they are ordinary properties
        and recreate fidelity matters more than prettiness)."""
        table = self.load(name)
        snap = table.current()
        cols = ",\n  ".join(
            f"{c} {d.upper()}" + (" PRIMARY KEY" if c == snap.key else "")
            for c, d in table.schema_fields(snap)
        )
        out = (
            f"CREATE TABLE {name} (\n  {cols}\n) "
            f"PARTITIONED BY (BUCKET({snap.n_buckets}, {snap.key}))"
        )
        props = dict(snap.props)
        if snap.order_col != "lsn":
            props["sequence.field"] = snap.order_col
        if props:
            body = ", ".join(
                f"{_q(k)}={_q(v)}" for k, v in sorted(props.items())
            )
            out += f"\nTBLPROPERTIES ({body})"
        return out

    _CTAS = re.compile(
        r"^\s*CREATE\s+TABLE\s+(?P<name>\w+)\s+"
        r"PRIMARY\s+KEY\s*\(\s*(?P<key>\w+)\s*\)\s*"
        r"(?:PARTITIONED\s+BY\s*\(\s*BUCKET\s*\(\s*(?P<nb>\d+)\s*,\s*"
        r"(?P<bcol>\w+)\s*\)\s*\)\s*)?"
        r"(?:TBLPROPERTIES\s*\(\s*(?P<props>.+?)\s*\)\s*)?"
        r"AS\s+(?P<select>SELECT\b.+)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _ctas_sql(
        self,
        statement: str,
        commit_key: str | None,
        sources: dict[str, DataFrame] | None,
    ) -> LakeTable:
        """``CREATE TABLE t PRIMARY KEY (k) [PARTITIONED BY (BUCKET(n,
        k))] [TBLPROPERTIES (...)] AS SELECT ...`` — CTAS with the
        engine's keyed-table contract made explicit (Delta CTAS has no
        key; an LWW table cannot infer one, so the clause is required).
        The schema comes from the SELECT's result; the order column
        (``sequence.field`` property, default ``lsn``) must be among
        the projected columns. Needs ``commit_key`` (it commits data).

        Crash-safe and replayable: the table-create commit and the data
        commit are the engine's ordinary idempotent commits, so a CTAS
        that died between them RESUMES on re-run (table exists, data
        key absent → insert only), and a completed CTAS re-run is a
        recorded no-op — the multi-statement analog of every other
        exactly-once path here."""
        m = self._CTAS.match(statement)
        if not m:
            raise ValueError(
                "unparseable CTAS — CREATE TABLE t PRIMARY KEY (k) "
                "[PARTITIONED BY (BUCKET(n, k))] [TBLPROPERTIES (...)] "
                "AS SELECT ..."
            )
        if commit_key is None:
            raise ValueError("CREATE TABLE ... AS SELECT needs a commit_key")
        name, key = m.group("name"), m.group("key")
        if m.group("bcol") is not None and m.group("bcol") != key:
            raise ValueError(
                f"BUCKET column {m.group('bcol')!r} must be the PRIMARY "
                f"KEY ({key!r}) — the table is key-hash-bucketed"
            )
        df = self.sql(m.group("select"), sources=sources)
        schema = [
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        ]
        cols = {c for c, _ in schema}
        if key not in cols:
            raise KeyError(f"PRIMARY KEY {key!r} not in the SELECT output")
        props = _parse_props(m.group("props"))
        order_col = props.pop("sequence.field", "lsn")
        if order_col not in cols:
            raise ValueError(
                f"order column {order_col!r} not in the SELECT output — "
                "project it, or name one via TBLPROPERTIES "
                "('sequence.field'='...')"
            )
        if self.table_exists(name):
            table = self.load(name)
            have = [(c, d) for c, d in table.schema_fields(table.current())]
            if have != schema:
                raise FileExistsError(
                    f"table {name!r} already exists with a different schema"
                )
        else:
            table = self.create_table(
                name, schema, key, int(m.group("nb") or 64),
                order_col=order_col, props=props,
            )
        from pyspark.sql import functions as F

        from data_pipeline_spark.lake.merge import merge_into

        merge_into(
            table, df.withColumn("op", F.lit("upsert")), f"ctas:{commit_key}"
        )
        return table

    def _create_sql(self, statement: str) -> LakeTable:
        m = _CREATE.match(statement)
        if not m:
            raise ValueError(
                "unparseable CREATE TABLE — expected: CREATE TABLE t "
                "(c TYPE [PRIMARY KEY], ...) [PARTITIONED BY "
                "(BUCKET(n, keycol))] [TBLPROPERTIES ('k'='v', ...)]"
            )
        schema: list[tuple[str, str]] = []
        key = None
        for coldef in _split_top_level(m.group("cols")):
            cm = re.match(
                r"^(?P<c>\w+)\s+(?P<t>[\w()<>, ]+?)"
                r"(?:\s+(?P<pk>PRIMARY\s+KEY))?$",
                coldef,
                re.IGNORECASE,
            )
            if not cm:
                raise ValueError(f"bad column definition {coldef!r}")
            schema.append((cm.group("c"), cm.group("t").strip().lower()))
            if cm.group("pk"):
                if key is not None:
                    raise ValueError("multiple PRIMARY KEY columns")
                key = cm.group("c")
        cols = {c for c, _ in schema}
        if key is None:
            raise ValueError(
                "CREATE TABLE needs exactly one column marked PRIMARY KEY "
                "(the LWW key)"
            )
        if m.group("bcol") is not None and m.group("bcol") != key:
            raise ValueError(
                f"BUCKET column {m.group('bcol')!r} must be the PRIMARY "
                f"KEY ({key!r}) — the table is key-hash-bucketed"
            )
        n_buckets = int(m.group("nb")) if m.group("nb") else 64
        props = _parse_props(m.group("props"))
        order_col = props.pop("sequence.field", "lsn")
        if order_col not in cols:
            raise ValueError(
                f"order column {order_col!r} not in the schema — declare "
                "it, or name one via TBLPROPERTIES ('sequence.field'='...')"
            )
        return self.create_table(
            m.group("name"), schema, key, n_buckets,
            order_col=order_col, props=props,
        )

    def _alter_sql(self, statement: str, commit_key: str | None):
        m = _ALTER.match(statement)
        if not m:
            raise ValueError("unparseable ALTER TABLE")
        name, rest = m.group("name"), m.group("rest").strip()
        rm = _RENAME_TBL.match(rest)
        if rm:
            return self.rename_table(name, rm.group("new"))
        table = self.load(name)
        am = _ADD_COLS.match(rest)
        if am:
            cols_txt = am.group("cols").strip()
            if cols_txt[:1] == "(" and cols_txt[-1:] == ")":
                cols_txt = cols_txt[1:-1]
            add: dict[str, str] = {}
            defaults: dict[str, Any] = {}
            for coldef in _split_top_level(cols_txt):
                cm = re.match(
                    r"^(?P<c>\w+)\s+(?P<t>[\w()<>, ]+?)"
                    r"(?:\s+DEFAULT\s+(?P<d>.+))?$",
                    coldef,
                    re.IGNORECASE,
                )
                if not cm:
                    raise ValueError(f"bad column definition {coldef!r}")
                add[cm.group("c")] = cm.group("t").strip().lower()
                if cm.group("d") is not None:
                    defaults[cm.group("c")] = _parse_default(cm.group("d"))
            return table.evolve_schema(
                add_columns=add, defaults=defaults or None,
                commit_key=commit_key,
            )
        rm = _RENAME_COL.match(rest)
        if rm:
            return table.evolve_schema(
                rename_columns={rm.group("old"): rm.group("new")},
                commit_key=commit_key,
            )
        dm = _DROP_COL.match(rest)
        if dm:
            return table.evolve_schema(
                drop_columns=[dm.group("col")], commit_key=commit_key
            )
        tm = _ALTER_COL.match(rest)
        if tm:
            return table.evolve_schema(
                widen={tm.group("col"): tm.group("type").strip().lower()},
                commit_key=commit_key,
            )
        pm = _SET_PROPS.match(rest)
        if pm:
            return table.update_props(_parse_props(pm.group("props")))
        cm = re.match(
            r"ADD\s+CONSTRAINT\s+(?P<n>\w+)\s+CHECK\s*\((?P<p>.+)\)\s*;?\s*$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if cm:
            from data_pipeline_spark import constraints

            return constraints.add_check(table, cm.group("n"), cm.group("p"))
        cm = re.match(
            r"DROP\s+CONSTRAINT\s+(?P<n>\w+)\s*;?\s*$", rest, re.IGNORECASE
        )
        if cm:
            from data_pipeline_spark import constraints

            return constraints.drop_check(table, cm.group("n"))
        raise ValueError(
            f"unsupported ALTER TABLE action {rest.split()[0]!r} — "
            "ADD COLUMN[S] / RENAME COLUMN / DROP COLUMN / ALTER COLUMN "
            "TYPE / ADD/DROP CONSTRAINT / SET TBLPROPERTIES / RENAME TO "
            "only"
        )
