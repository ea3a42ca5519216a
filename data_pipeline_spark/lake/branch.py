"""Named branches: multi-commit write-audit-publish (Nessie / Iceberg
branch semantics).

A branch forks from the main head and accepts ANY number of ordinary
commits — merges, compactions, schema evolution — through the unmodified
engine machinery: :class:`BranchHandle` subclasses ``LakeTable`` and
re-points only the head ref and snapshot namespace, so ``merge_into``,
``commit_delta``, ``compact``, ``maintenance.*`` all work on a branch
verbatim. Main readers never see branch state (its snapshots live under
``_branches/<name>/``; its data files are uuid-suffixed like every
commit's, so nothing collides).

``publish_branch`` fast-forwards main to the branch head iff main has
not moved since the fork — the multi-commit generalization of the
single-commit ``stage_id`` WAP path (lake/table.py publish_staged). A
moved main head raises :class:`BranchDivergedError`; re-running the
work against the new head is the caller's call, exactly like a true
commit conflict. Branch commit keys ride into main on publish, so a
replayed pipeline stays exactly-once across the publish boundary.

An abandoned branch is dropped with :func:`delete_branch`; its
unpublished files become unreferenced and ``vacuum`` reclaims them
(live branches count as vacuum roots — see ``LakeTable.vacuum``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from data_pipeline_spark.lake.table import (
    CURRENT_FILE,
    SNAPSHOT_DIR,
    ConcurrentCommitError,
    LakeTable,
    Snapshot,
    _atomic_write,
)

BRANCH_DIR = "_branches"
_HEAD = "_HEAD"
_FORK = "_FORK"


class BranchDivergedError(RuntimeError):
    pass


class BranchHandle(LakeTable):
    """A ``LakeTable`` whose head ref and new snapshots live under the
    branch directory; pre-fork history resolves from main."""

    def __init__(self, spark: SparkSession, root: str, name: str):
        super().__init__(spark, root)
        self.branch = name

    def _bdir(self) -> str:
        return os.path.join(self.root, BRANCH_DIR, self.branch)

    def fork_version(self) -> int:
        with open(os.path.join(self._bdir(), _FORK)) as f:
            return int(f.read().strip())

    def current(self) -> Snapshot:
        with open(os.path.join(self._bdir(), _HEAD)) as f:
            name = f.read().strip()
        return self._load_snap(name)

    def _load_snap(self, name: str) -> Snapshot:
        p = os.path.join(self._bdir(), name)
        if not os.path.exists(p):
            p = os.path.join(self.root, SNAPSHOT_DIR, name)
        with open(p) as f:
            return Snapshot.from_json(f.read())

    def snapshot(self, version: int) -> Snapshot:
        return self._load_snap(f"v{version:08d}.json")

    def _write_snapshot(self, snap: Snapshot, expect_parent: int | None) -> None:
        head_path = os.path.join(self._bdir(), _HEAD)
        if expect_parent is not None:
            with open(head_path) as f:
                cur_name = f.read().strip()
            if cur_name != f"v{expect_parent:08d}.json":
                raise ConcurrentCommitError(
                    f"branch {self.branch}: expected parent "
                    f"v{expect_parent}, head is {cur_name}"
                )
        name = f"v{snap.version:08d}.json"
        _atomic_write(os.path.join(self._bdir(), name), snap.to_json())
        _atomic_write(head_path, name)


def create_branch(table: LakeTable, name: str) -> BranchHandle:
    """Fork ``name`` from the current main head."""
    h = BranchHandle(table.spark, table.root, name)
    bdir = h._bdir()
    if os.path.exists(os.path.join(bdir, _HEAD)):
        raise ValueError(f"branch {name!r} already exists")
    os.makedirs(bdir, exist_ok=True)
    fork = table.current().version
    _atomic_write(os.path.join(bdir, _FORK), str(fork))
    _atomic_write(os.path.join(bdir, _HEAD), f"v{fork:08d}.json")
    return h


def branch_handle(table: LakeTable, name: str) -> BranchHandle:
    h = BranchHandle(table.spark, table.root, name)
    if not os.path.exists(os.path.join(h._bdir(), _HEAD)):
        raise ValueError(f"no such branch {name!r}")
    return h


def list_branches(table: LakeTable) -> list[str]:
    d = os.path.join(table.root, BRANCH_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        n for n in os.listdir(d)
        if os.path.exists(os.path.join(d, n, _HEAD))
    )


def publish_branch(
    table: LakeTable, name: str, rebase: bool = False
) -> Snapshot:
    """Fast-forward main to the branch head. If main moved since the
    fork: with ``rebase=False`` refuse (the branch's commits were
    validated against a head that no longer exists — same rule as a
    staged commit whose parent moved); with ``rebase=True`` attempt the
    branch-level analog of ``commit_delta``'s optimistic rebase — when
    the branch and post-fork main touched DISJOINT buckets (and neither
    evolved the schema or split buckets), the branch's bucket manifests
    are still correct verbatim against the new head (an untouched
    bucket's manifest chain is identical on both lines), so one rebased
    snapshot layers them onto main. Overlapping buckets, schema changes,
    or splits still refuse: replaying those needs the data re-run."""
    h = branch_handle(table, name)
    head = h.current()
    fork = h.fork_version()
    main = table.current()
    if head.version == fork:  # nothing committed — just drop the ref
        delete_branch(table, name)
        return main
    if main.version != fork:
        if not rebase:
            raise BranchDivergedError(
                f"main moved to v{main.version}; "
                f"branch {name!r} forked at v{fork}"
            )
        return _rebase_publish(table, h, head, fork, main)
    # Promote branch snapshots into main history (oldest first), then CAS
    # the head ref. A crash mid-copy leaves main untouched: _CURRENT only
    # moves in the final step. The copies use O_EXCL create-or-fail — a
    # main-line writer racing this loop commits v{fork+1} under the SAME
    # fixed name, and an atomic-replace copy would silently overwrite its
    # freshly-referenced snapshot (the CAS below would then raise with
    # _CURRENT pointing at corrupted-from-main's-view JSON). Refusing on
    # an existing file turns that race into the loud BranchDivergedError
    # every other writer conflict raises. Stray copies from a publish
    # that crashed mid-loop are unreachable (the pointer never moved) but
    # now BLOCK main commits at those versions — loudly, never silently
    # (main's exclusive version-file create refuses; see
    # LakeTable._write_snapshot). Recovery is explicit: delete the stray
    # files and re-run publish, or finish it; recover_head() must NOT be
    # used here (it would adopt a PREFIX of the branch — its docstring
    # carries the same warning).
    for v in range(fork + 1, head.version + 1):
        sname = f"v{v:08d}.json"
        src = os.path.join(h._bdir(), sname)
        dst = os.path.join(table.root, SNAPSHOT_DIR, sname)
        with open(src) as f:
            content = f.read()
        try:
            fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise BranchDivergedError(
                f"main committed {sname} while publishing branch "
                f"{name!r}; re-run publish (rebase=True if buckets are "
                f"disjoint) against the new head"
            )
        with os.fdopen(fd, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
    # The head's version FILE was created by the copy loop above (every
    # copy is O_EXCL — this publish owns those names), so the commit is
    # just the pointer CAS; going through _write_snapshot would refuse on
    # its own exclusive create of a file that legitimately exists.
    cur_path = os.path.join(table.root, CURRENT_FILE)
    with open(cur_path) as f:
        cur_name = f.read().strip()
    if cur_name != f"v{fork:08d}.json":
        raise BranchDivergedError(
            f"main moved to {cur_name} while publishing branch {name!r}"
        )
    _atomic_write(cur_path, f"v{head.version:08d}.json")
    delete_branch(table, name)
    return head


def _rebase_publish(
    table: LakeTable,
    h: BranchHandle,
    head: Snapshot,
    fork: int,
    main: Snapshot,
) -> Snapshot:
    fork_snap = h.snapshot(fork)
    if (
        main.schema_version != fork_snap.schema_version
        or head.schema_version != fork_snap.schema_version
        or main.depths != fork_snap.depths
        or head.depths != fork_snap.depths
        or main.n_buckets != fork_snap.n_buckets
    ):
        raise BranchDivergedError(
            "rebase refused: schema or bucket layout changed on one line"
        )
    branch_touched = {
        b
        for b in head.manifests
        if head.manifests[b] != fork_snap.manifests.get(b)
    }
    main_touched = {
        b
        for b in main.manifests
        if main.manifests[b] != fork_snap.manifests.get(b)
    }
    overlap = branch_touched & main_touched
    if overlap:
        raise BranchDivergedError(
            f"rebase refused: both lines touched buckets {sorted(overlap)}"
        )
    new = Snapshot(
        version=main.version + 1,
        schema_version=main.schema_version,
        schemas=main.schemas,
        n_buckets=main.n_buckets,
        key=main.key,
        manifests={
            **main.manifests,
            **{b: head.manifests[b] for b in branch_touched},
        },
        commits={
            **main.commits,
            **{
                k: main.version + 1
                for k in head.commits
                if k not in main.commits
            },
        },
        summary={
            "op": "merge",
            "rebased_branch": h.branch,
            "branch_head": head.version,
            "touched": sorted(int(b) for b in branch_touched),
        },
        order_col=main.order_col,
        props={**main.props, **head.props},
        depths=dict(main.depths),
    )
    # The rebased snapshot references the branch's manifest files (they
    # live in the shared _manifests dir and are immutable) — only the
    # snapshot JSON is new.
    table._write_snapshot(new, expect_parent=main.version)
    delete_branch(table, h.branch)
    return new


def delete_branch(table: LakeTable, name: str) -> None:
    """Drop the branch ref; unpublished files become vacuum-reclaimable."""
    h = branch_handle(table, name)
    shutil.rmtree(h._bdir())


def branch_snapshot_roots(table: LakeTable) -> list[Snapshot]:
    """Every snapshot of every live branch — vacuum roots: their data
    files and manifests must survive until the branch publishes or dies."""
    out: list[Snapshot] = []
    d = os.path.join(table.root, BRANCH_DIR)
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        bdir = os.path.join(d, name)
        for fn in os.listdir(bdir):
            if fn.startswith("v") and fn.endswith(".json"):
                with open(os.path.join(bdir, fn)) as f:
                    out.append(Snapshot.from_json(f.read()))
    return out
