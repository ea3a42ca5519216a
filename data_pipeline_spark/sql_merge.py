"""SQL text front end for conditional MERGE — the statement a
Delta/Iceberg user already writes, compiled onto this engine's
:func:`operators.merge_clauses.merge_when`:

    MERGE INTO pages AS t
    USING updates AS s
    ON t.url = s.url
    WHEN MATCHED AND s.op = 'delete' THEN DELETE
    WHEN MATCHED THEN UPDATE SET lang = s.lang
    WHEN NOT MATCHED THEN INSERT *

Why a bespoke parser instead of ``spark.sql``: open-source Spark parses
``MERGE INTO`` but can only EXECUTE it against a catalog that implements
row-level operations (Delta's extension or an Iceberg catalog jar) — in
a jar-less deployment the statement dies at analysis. The grammar below
is the intersection both of those engines accept, so statements written
here run unchanged on Delta/Iceberg later (the reverse-compatibility
mirror of lake/interop.py's reader_sql export).

Restricted grammar (case-insensitive keywords, one clause per kind —
Delta's semantics are in-order first-match anyway, and the engine's
DELETE-before-UPDATE precedence matches Delta's canonical CDC form):

    MERGE INTO <target> [AS] <t-alias>
    USING (<ident> | (<subquery>)) [AS] <s-alias>
    ON <t-alias>.<key> = <s-alias>.<key>      -- key equality, either order
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET <col> = <expr>[, ...] | SET *]
    [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET <col> = <expr>[, ...]]

BY SOURCE clauses (Delta's snapshot-sync family) see only ``t.*`` —
conditions or SETs referencing the source alias are refused, and the
emitted event advances the row's own order column by 1 (no source row
to take it from).

Conditions / SET expressions are ordinary Spark SQL over the two
aliases; they are rewritten to the canonical ``s.`` / ``t.`` before
compilation (word-boundary alias rewrite, quoted strings left intact).
Everything after the parse is the existing engine: pruned target fetch,
one declarative clause join, merge-on-read event commit, exactly-once
on ``commit_key``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from data_pipeline_spark.lake.merge import MergeStats
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.operators.merge_clauses import merge_when

_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)\s+(?:AS\s+)?(?P<t>\w+)\s+"
    r"USING\s+(?:(?P<src>[\w.]+)|\((?P<sub>.+?)\))\s+(?:AS\s+)?(?P<s>\w+)\s+"
    r"ON\s+(?P<on>.+?)\s*(?=WHEN\s)",
    re.IGNORECASE | re.DOTALL,
)
_CLAUSE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s*(?P<bysrc>BY\s+SOURCE\s*)?"
    r"(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>DELETE|UPDATE\s+SET\s+(?P<set>.+?)|INSERT\s*\*)\s*"
    r"(?=WHEN\s|$)",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parens/quotes (SET assignment list)."""
    parts, depth, q, start = [], 0, None, 0
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _rewrite_aliases(expr: str, t_alias: str, s_alias: str) -> str:
    """Rewrite user aliases to the canonical t./s. outside quotes."""
    out, q = [], None
    i = 0
    pat = re.compile(
        rf"\b({re.escape(t_alias)}|{re.escape(s_alias)})\s*\.", re.IGNORECASE
    )
    while i < len(expr):
        ch = expr[i]
        if q is None and ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
        elif q is not None:
            if ch == q:
                q = None
            out.append(ch)
            i += 1
        else:
            m = pat.match(expr, i)
            if m:
                alias = m.group(1).lower()
                out.append("t." if alias == t_alias.lower() else "s.")
                i = m.end()
            else:
                out.append(ch)
                i += 1
    return "".join(out)


def merge_sql(
    sql: str,
    commit_key: str,
    tables: dict[str, LakeTable],
    sources: dict[str, DataFrame] | None = None,
    **merge_kw,
) -> MergeStats:
    """Parse and execute one MERGE statement. ``tables`` resolves the
    target name; ``USING <name>`` resolves through ``sources`` first,
    then Spark temp views; ``USING (SELECT ...)`` runs through
    ``spark.sql``. Extra kwargs pass to :func:`merge_when`
    (``max_point_keys`` etc.)."""
    head = _HEAD.match(sql)
    if not head:
        raise ValueError(
            "unparseable MERGE header — expected: MERGE INTO <tbl> [AS] t "
            "USING <src|(subquery)> [AS] s ON t.<key> = s.<key> WHEN ..."
        )
    tname = head.group("target")
    if tname not in tables:
        raise KeyError(f"unknown target table {tname!r}")
    table = tables[tname]
    t_alias, s_alias = head.group("t"), head.group("s")
    if t_alias.lower() == s_alias.lower():
        raise ValueError("target and source aliases must differ")

    spark = table.spark
    if head.group("sub"):
        # Subquery resolution follows the _resolver contract: hermetic
        # over ``sources`` when supplied, else the caller's own views.
        source = _resolver(spark, sources).sql(head.group("sub"))
    else:
        sname = head.group("src")
        source = (sources or {}).get(sname)
        if source is None:
            source = spark.table(sname)

    key = table.current().key
    on = _rewrite_aliases(head.group("on"), t_alias, s_alias)
    canon = {
        re.sub(r"\s+", "", f"t.{key}=s.{key}"),
        re.sub(r"\s+", "", f"s.{key}=t.{key}"),
    }
    if re.sub(r"\s+", "", on) not in canon:
        raise ValueError(
            f"ON must be key equality on {key!r} "
            f"(got {head.group('on')!r}) — general join conditions are "
            "not part of the restricted grammar"
        )

    kw: dict = dict(
        matched_update=None,
        matched_update_cond=None,
        matched_delete_cond=None,
        insert_not_matched=False,
        not_matched_cond=None,
    )
    body = sql[head.end():]
    seen_clauses = set()
    matched_count = 0
    for m in _CLAUSE.finditer(body):
        is_not = bool(m.group("not"))
        by_src = bool(m.group("bysrc"))
        cond = m.group("cond")
        cond = (
            _rewrite_aliases(cond, t_alias, s_alias) if cond else None
        )
        action = m.group("action").upper()
        if by_src:
            if not is_not:
                raise ValueError("BY SOURCE requires WHEN NOT MATCHED")
            if action == "DELETE":
                kind = "by_source_delete"
            elif action.startswith("UPDATE"):
                kind = "by_source_update"
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports only DELETE or "
                    "UPDATE SET <col> = <expr> (there is no source row "
                    "to INSERT)"
                )
            if kind in seen_clauses:
                raise ValueError(f"duplicate WHEN clause kind: {kind}")
            seen_clauses.add(kind)
            if kind == "by_source_delete":
                kw["by_source_delete_cond"] = cond or "true"
            else:
                set_txt = m.group("set").strip()
                if set_txt == "*":
                    raise ValueError(
                        "SET * is meaningless for NOT MATCHED BY SOURCE "
                        "(no source row) — name the columns"
                    )
                upd = {}
                for a in _split_top_level(set_txt):
                    col, _, expr = a.partition("=")
                    col = col.strip()
                    if not expr.strip():
                        raise ValueError(f"bad SET assignment {a!r}")
                    if "." in col:
                        alias, _, bare = col.partition(".")
                        if alias.lower() != t_alias.lower():
                            raise ValueError(
                                f"SET target {col!r} must be a target column"
                            )
                        col = bare.strip()
                    upd[col] = _rewrite_aliases(
                        expr.strip(), t_alias, s_alias
                    )
                kw["by_source_update"] = upd
                kw["by_source_update_cond"] = cond
            continue
        if is_not:
            if not action.startswith("INSERT"):
                raise ValueError(
                    "WHEN NOT MATCHED supports only INSERT * "
                    "(or add BY SOURCE for DELETE / UPDATE)"
                )
            kind = "insert"
        elif action == "DELETE":
            kind = "delete"
        elif action.startswith("UPDATE"):
            kind = "update"
        else:
            raise ValueError(f"unsupported matched action {action!r}")
        if kind in seen_clauses:
            raise ValueError(f"duplicate WHEN clause kind: {kind}")
        seen_clauses.add(kind)
        if kind == "insert":
            kw["insert_not_matched"] = True
            kw["not_matched_cond"] = cond
        elif kind == "delete":
            kw["matched_delete_cond"] = cond or "true"
            matched_count += 1
        else:
            set_txt = m.group("set").strip()
            if set_txt == "*":
                fields = table.schema_fields(table.current())
                order = table.current().order_col
                kw["matched_update"] = {
                    n: f"s.{n}"
                    for n, _ in fields
                    if n not in (key, order)
                }
            else:
                upd = {}
                for a in _split_top_level(set_txt):
                    col, _, expr = a.partition("=")
                    col = col.strip()
                    if not expr.strip():
                        raise ValueError(f"bad SET assignment {a!r}")
                    if "." in col:
                        alias, _, bare = col.partition(".")
                        if alias.lower() != t_alias.lower():
                            raise ValueError(
                                f"SET target {col!r} must be a target column"
                            )
                        col = bare.strip()
                    upd[col] = _rewrite_aliases(
                        expr.strip(), t_alias, s_alias
                    )
                kw["matched_update"] = upd
            kw["matched_update_cond"] = cond
            matched_count += 1
    if not seen_clauses:
        raise ValueError("MERGE needs at least one WHEN clause")
    # DELETE-before-UPDATE is the engine's fixed precedence (Delta's
    # canonical CDC ordering); statements relying on UPDATE being tried
    # first would silently change meaning, so refuse them at parse time.
    if matched_count == 2:
        first = next(
            (
                m
                for m in _CLAUSE.finditer(body)
                if not m.group("not") and not m.group("bysrc")
            ),
            None,
        )
        if first and first.group("action").upper().startswith("UPDATE"):
            du = kw["matched_update_cond"]
            if du is None:
                raise ValueError(
                    "an unconditional UPDATE written before DELETE would "
                    "shadow it under in-order semantics, but this engine "
                    "evaluates DELETE first — add a condition to the "
                    "UPDATE clause or reorder the statement"
                )
    if "by_source_delete" in seen_clauses and "by_source_update" in seen_clauses:
        first_bs = next(
            m for m in _CLAUSE.finditer(body) if m.group("bysrc")
        )
        if (
            first_bs.group("action").upper().startswith("UPDATE")
            and kw.get("by_source_update_cond") is None
        ):
            raise ValueError(
                "an unconditional BY SOURCE UPDATE written before BY "
                "SOURCE DELETE would shadow it under in-order semantics, "
                "but this engine evaluates DELETE first — add a condition "
                "to the UPDATE clause or reorder the statement"
            )
    return merge_when(table, source, commit_key, **kw, **merge_kw)


# -- UPDATE / DELETE statements ----------------------------------------------

_UPDATE_HEAD = re.compile(
    r"^\s*UPDATE\s+(?P<target>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?P<t>(?!SET\b)\w+))?"
    r"\s+SET\s+(?P<set>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_HEAD = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?P<t>(?!WHERE\b)\w+))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_HEAD = re.compile(
    r"^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<target>[\w.]+)\s*"
    r"(?:\(\s*(?P<cols>[^)]+?)\s*\)\s*)?"
    r"(?P<body>(?:VALUES|SELECT)\b.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _resolver(spark, sources):
    """The session a statement body resolves names on.

    With ``sources`` supplied: a HERMETIC child session holding exactly
    those names (session.hermetic_session + bridge_views) — the statement
    sees the caller's DataFrames and nothing else, and registers nothing
    in any shared namespace (two concurrent DMLs whose sources share a
    name like ``pages`` can no longer read each other's relation — the
    round-3 ``cdc_catalog_sql`` hazard). Without ``sources``: the
    caller's own session, whose temp views the statement may reference.
    """
    if not sources:
        return spark
    from data_pipeline_spark.session import bridge_views, hermetic_session

    child = hermetic_session(spark)
    bridge_views(child, sources)
    return child


def _insert_rows(table: LakeTable, m, sources) -> tuple:
    """Resolve an INSERT statement's row source and column list."""
    spark = _resolver(table.spark, sources)
    snap = table.current()
    fields = table.schema_fields(snap)
    all_cols = [n for n, _ in fields]
    named = (
        [c.strip() for c in m.group("cols").split(",")]
        if m.group("cols")
        else all_cols
    )
    unknown = set(named) - set(all_cols)
    if unknown:
        raise KeyError(f"INSERT names unknown columns {sorted(unknown)}")
    if len(set(named)) != len(named):
        raise ValueError("INSERT column list has duplicates")
    if snap.key not in named:
        raise ValueError(
            f"INSERT must supply the key column ({snap.key}) — "
            "this is a keyed table"
        )
    body = m.group("body")
    if body.lstrip()[:6].upper() == "VALUES":
        rows = spark.sql(f"SELECT * FROM {body} AS v({', '.join(named)})")
    else:
        rows = spark.sql(body)
        if len(rows.columns) != len(named):
            raise ValueError(
                f"SELECT yields {len(rows.columns)} columns, INSERT "
                f"expects {len(named)}"
            )
        rows = rows.toDF(*named)
    return rows, named, snap, fields


def insert_sql(
    sql: str,
    commit_key: str,
    tables: dict[str, LakeTable],
    sources: dict[str, DataFrame] | None = None,
) -> MergeStats:
    """``INSERT INTO`` / ``INSERT OVERWRITE`` compiled onto the engine.

    The table is KEYED, so ``INSERT INTO`` rows are upsert events — an
    existing key's row is superseded (LWW), never duplicated; omitted
    columns land as NULL; an omitted order column is stamped at the
    table's high-watermark + 1 (the same "as of this snapshot" fence as
    UPDATE/DELETE), while an explicit one keeps replay ordering in the
    user's hands. ``INSERT OVERWRITE`` is full-table replacement and
    compiles onto the snapshot-sync MERGE (matched rows update, new rows
    insert, rows ABSENT from the inserted set are swept by the
    NOT MATCHED BY SOURCE delete) — O(live ∪ inserted) events through
    the ordinary merge-on-read delta path, never a physical truncate, so
    it composes with time travel and exactly-once commit keys. OVERWRITE
    owns the fence: an explicit order column is refused.

    Row sources: ``VALUES (...), (...)`` (Spark inline table) or a full
    ``SELECT`` — with ``sources`` supplied the SELECT resolves names
    hermetically over exactly those DataFrames (child session, nothing
    registered in the caller's namespace); without it, over the caller
    session's own temp views."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.lake.merge import MergeStats, merge_into
    from data_pipeline_spark.operators.merge_clauses import merge_when

    m = _INSERT_HEAD.match(sql)
    if not m:
        raise ValueError(
            "unparseable INSERT — expected: INSERT INTO|OVERWRITE <tbl> "
            "[(col, ...)] VALUES (...)[, ...] | SELECT ..."
        )
    tname = m.group("target")
    if tname not in tables:
        raise KeyError(f"unknown target table {tname!r}")
    table = tables[tname]
    rows, named, snap, fields = _insert_rows(table, m, sources)
    if commit_key in snap.commits:
        return MergeStats(commit_key, False, snap.version, 0)
    key, order = snap.key, snap.order_col
    overwrite = m.group("mode").upper() == "OVERWRITE"
    if overwrite and order in named:
        raise ValueError(
            f"INSERT OVERWRITE owns the order column ({order}) — "
            "remove it from the column list"
        )
    if order not in named:
        fence = table.read(columns=[]).agg(F.max(order)).first()[0]
        rows = rows.withColumn(order, F.lit((fence or 0) + 1))
    aligned = rows.select(
        *[
            (
                F.col(n).cast(d) if n in named or n == order
                else F.lit(None).cast(d)
            ).alias(n)
            for n, d in fields
        ]
    )
    if not overwrite:
        events = aligned.withColumn("op", F.lit("insert"))
        return merge_into(table, events, commit_key)
    data_cols = [n for n, _ in fields if n not in (key, order)]
    return merge_when(
        table,
        aligned,
        commit_key,
        matched_update={c: f"s.{c}" for c in data_cols},
        by_source_delete_cond="true",
    )


def _strip_alias(expr: str, alias: str | None) -> str:
    """Drop ``alias.`` prefixes outside quotes — UPDATE/DELETE expressions
    evaluate over the table's own columns, no second side exists."""
    if not alias:
        return expr
    out, q, i = [], None, 0
    pat = re.compile(rf"\b{re.escape(alias)}\s*\.", re.IGNORECASE)
    while i < len(expr):
        ch = expr[i]
        if q is None and ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
        elif q is not None:
            if ch == q:
                q = None
            out.append(ch)
            i += 1
        else:
            m = pat.match(expr, i)
            if m:
                i = m.end()
            else:
                out.append(ch)
                i += 1
    return "".join(out)


def dml_sql(
    sql: str,
    commit_key: str,
    tables: dict[str, LakeTable],
    sources: dict[str, DataFrame] | None = None,
    **kw,
) -> MergeStats:
    """One DML statement — ``MERGE INTO`` / ``INSERT INTO|OVERWRITE`` /
    ``UPDATE`` / ``DELETE FROM`` — parsed and compiled onto the engine's
    native operators. INSERT maps to :func:`insert_sql`. UPDATE maps to
    :func:`maintenance.update_where` (matching live rows re-enter with SET
    applied, fenced at high-watermark lsn + 1), DELETE to
    :func:`maintenance.delete_where` (tombstones at the same fence); both
    are O(matching rows) merge-on-read delta commits, idempotent on
    ``commit_key``. Omitting WHERE touches the whole table, as in
    Delta/Iceberg. SET/WHERE texts are ordinary Spark SQL over the table's
    columns (an optional alias is stripped)."""
    from data_pipeline_spark.maintenance import delete_where, update_where

    head_kw = re.match(r"\s*(\w+)", sql)
    verb = (head_kw.group(1) if head_kw else "").upper()
    if verb == "MERGE":
        return merge_sql(sql, commit_key, tables, sources, **kw)
    if verb == "INSERT":
        return insert_sql(sql, commit_key, tables, sources, **kw)

    def _target(m) -> LakeTable:
        tname = m.group("target")
        if tname not in tables:
            raise KeyError(f"unknown target table {tname!r}")
        return tables[tname]

    if verb == "UPDATE":
        m = _UPDATE_HEAD.match(sql)
        if not m:
            raise ValueError(
                "unparseable UPDATE — expected: UPDATE <tbl> [AS t] "
                "SET col = expr[, ...] [WHERE <pred>]"
            )
        table = _target(m)
        alias = m.group("t")
        upd: dict[str, str] = {}
        for a in _split_top_level(m.group("set")):
            col, _, expr = a.partition("=")
            col = col.strip()
            if not expr.strip():
                raise ValueError(f"bad SET assignment {a!r}")
            if "." in col:
                al, _, bare = col.partition(".")
                if alias is None or al.lower() != alias.lower():
                    raise ValueError(f"SET target {col!r} is not the target alias")
                col = bare.strip()
            upd[col] = _strip_alias(expr.strip(), alias)
        where = _strip_alias(m.group("where") or "true", alias)
        return update_where(table, upd, where, commit_key)

    if verb == "DELETE":
        m = _DELETE_HEAD.match(sql)
        if not m:
            raise ValueError(
                "unparseable DELETE — expected: DELETE FROM <tbl> [AS t] "
                "[WHERE <pred>]"
            )
        table = _target(m)
        where = _strip_alias(m.group("where") or "true", m.group("t"))
        from pyspark.sql import functions as F

        return delete_where(table, F.expr(where), commit_key)

    raise ValueError(
        f"unsupported DML verb {verb!r} — MERGE/INSERT/UPDATE/DELETE only"
    )
