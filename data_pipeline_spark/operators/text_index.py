"""Incrementally-maintained inverted TEXT index (token → posting list).

``SecondaryIndex`` (index.py) answers equality on one scalar column; web
corpora need the multi-valued generalization — "which urls currently
contain BOTH 'update' AND '3' in their extracted text". ``TextIndex``
maintains a postings lake table keyed by ``(token, source key)``, folded
forward from the source table's retract-stream changelog
(``changelog_rows``) with the same cursor-in-table-props discipline as
``index.SecondaryIndex`` / ``matview.IncrementalView``: a crash between
"index merged" and "cursor advanced" replays idempotently (epoch commit
keys), and the cursor commits atomically with the data.

Per changelog row the document's token SET is exploded (``doc_tokens`` —
frozen, SQL-expressible spec shared verbatim with the DuckDB oracle):

* insert / update_postimage → one ASSERT row per token,
* delete / update_preimage  → one RETRACT row (tombstone) per token.

A token present in both images of an update nets to (retract, assert) on
the IDENTICAL index key inside one epoch; rows are fenced at
``2 * source_version + is_assert`` so the assert deterministically wins
that tie (the posting is still live) — the same equal-lsn discipline the
round-2 ADVICE forced into ``SecondaryIndex``. Tokens only in the
preimage tombstone away; tokens only in the postimage appear. No
read-modify-write of existing postings anywhere: maintenance is O(delta
documents × tokens/doc), never O(index).

Query shape (conjunctive AND over k terms): one stats-pruned postings
read PER TERM (after ``optimize()`` clusters files by token, each term
opens O(its posting files)), unioned, then ONE hash aggregate counting
distinct matched terms per source key — the intersection never
materializes pairwise joins, and map-side combine absorbs stopword-sized
posting lists before the shuffle. At 100 TB: k small scans + one
aggregate shuffled by src_key, O(Σ posting sizes) not O(corpus).

Reference analog: the catalog's free-text item search endpoint serves
this access path server-side (pgSTAC q= filter,
/root/reference/scripts/query_stac.py:152-202); here the index IS a lake
table maintained by O(delta) folds, queryable by any engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.lake.merge import merge_into
from data_pipeline_spark.lake.table import LakeTable

_CURSOR_PROP = "text_index_cursor"

# Frozen token spec v1: lowercase alnum runs. Changing this is a writer
# version bump (the extraction.py EXTRACTOR_VERSION discipline).
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def doc_tokens(col: Column) -> Column:
    """Distinct token set of a text column (array<string>, no empties)."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
        )
    )


def doc_tokens_duckdb(text_expr: str) -> str:
    """The identical token set in DuckDB (oracle side)."""
    return (
        f"list_distinct(list_filter(string_split_regex(lower({text_expr}), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> ''))"
    )


class TextIndex:
    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        root: str,
        column: str = "text",
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.source = source
        self.column = column
        src_fields = dict(source.schema_fields(source.current()))
        if column not in src_fields:
            raise ValueError(f"source has no column {column!r}")
        schema = [
            ("ik", "string"),
            ("lsn", "bigint"),
            ("tok", "string"),
            ("src_key", "string"),
        ]
        if LakeTable.exists(root):
            self.table = LakeTable(spark, root)
        else:
            self.table = LakeTable.create(
                spark, root, schema, key="ik", n_buckets=n_buckets
            )

    @property
    def cursor(self) -> int:
        return int(self.table.current().props.get(_CURSOR_PROP, 0))

    # -- maintenance --------------------------------------------------------

    def refresh(self) -> int:
        """Fold source changes newer than the cursor into the postings
        table; returns the new cursor (source head version). Idempotent:
        the epoch commit key dedupes and the cursor rides in the same
        commit's props."""
        src_key = self.source.current().key
        head = self.source.current().version
        cur = self.cursor
        if head <= cur:
            return cur
        ch = self.source.changelog_rows(cur, head, columns=[self.column])
        is_retract = F.col("op").isin("delete", "update_preimage")
        toks = ch.select(
            F.col(src_key).alias("src_key"),
            is_retract.alias("__r"),
            F.explode(doc_tokens(F.col(self.column))).alias("tok"),
        )
        rows = toks.select(
            F.to_json(F.struct(F.col("tok"), F.col("src_key"))).alias("ik"),
            (
                F.lit(2 * head).cast("bigint")
                + F.when(F.col("__r"), F.lit(0)).otherwise(F.lit(1))
            ).alias("lsn"),
            "tok",
            "src_key",
            F.when(F.col("__r"), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
        )
        merge_into(
            self.table,
            rows,
            commit_key=f"tix-{cur}-{head}",
            props_update={_CURSOR_PROP: head},
        )
        return head

    def optimize(
        self, commit_key: str, target_rows_per_file: int = 1 << 20
    ) -> None:
        """Cluster postings by token so per-term probes file-prune via
        manifest min/max stats on ``tok``."""
        self.table.compact(
            commit_key,
            cluster_by=["tok"],
            target_rows_per_file=target_rows_per_file,
        )

    # -- query ---------------------------------------------------------------

    def _term_postings(self, term: str) -> DataFrame:
        return self.table.read(
            stats_bounds={"tok": (term, term)}, columns=["tok", "src_key"]
        ).filter(F.col("tok") == term)

    def lookup_keys(self, terms: list[str]) -> DataFrame:
        """Source keys whose CURRENT document contains every term
        (conjunctive AND). One pruned postings read per term, one hash
        aggregate — no pairwise intersection joins."""
        toks = sorted({t.lower() for t in terms})
        if not toks:
            raise ValueError("empty term list")
        parts = [self._term_postings(t) for t in toks]
        union = reduce(DataFrame.unionByName, parts)
        return (
            union.groupBy("src_key")
            .agg(F.countDistinct("tok").alias("__n"))
            .filter(F.col("__n") == len(toks))
            .select("src_key")
        )

    def search(self, terms: list[str], max_point_keys: int = 1024) -> DataFrame:
        """Source rows matching all terms, selectivity-routed the same
        way as ``SecondaryIndex.lookup``: few matches → bloom/bucket
        point lookup (O(matching files)); many → one source scan with a
        left-semi join against the matched keys (no driver key state)."""
        keys = self.lookup_keys(terms)
        n = keys.count()
        if n == 0:
            return self.source.read(buckets=set())
        if n <= max_point_keys:
            vals = [r.src_key for r in keys.collect()]
            return self.source.lookup(vals)
        src_key = self.source.current().key
        return self.source.read().join(
            keys.withColumnRenamed("src_key", src_key), src_key, "left_semi"
        )
