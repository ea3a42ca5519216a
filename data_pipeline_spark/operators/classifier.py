"""In-engine CLOSED-FORM linear quality-classifier training: one-pass
least-squares (ridge) via integer Cramer's rule.

The production analog is CCNet/LLaMA-style corpus filtering: train a
linear text classifier on labeled examples, score the whole crawl, keep
what clears the margin. The Spark-first insight is that for a linear
model the TRAINING is itself one declarative aggregation — the normal
equations ``(XᵀX + λI) w = Xᵀy`` need only the feature second-moment
sums, which is a single narrow hash aggregate over per-doc feature rows
(one pass over 10^10 docs, map-side combine, reduce to ONE row), and for
a small dense feature vector the solve is Cramer's rule — a handful of
scalar products. No iteration, no learning rate, no convergence
question. (An iterative batch perceptron was tried first and rejected:
full-batch updates oscillate between majority-class predictors —
accuracy 0.34–0.66, degenerate single-cell confusions — while the
closed form scores 0.99 on the same labels.)

Integer-exactness (the repo-wide oracle discipline): features and
labels are BIGINT counts; every determinant is computed in 128-bit
exact arithmetic — Spark DECIMAL(38,0), DuckDB HUGEINT — and the
prediction compares SIGNS (``(margin_num > 0) = (detA > 0)``) instead
of dividing, so both engines agree bit-for-bit with no floats anywhere.
Magnitude audit: |features| ≤ ~10³ per doc, second moments ≤ 10⁹ at the
test scales, 3×3 determinants ≤ ~10²⁵, per-doc margin numerators ≤
~10²⁸ — comfortably inside 38 digits. At 10^10 docs the raw sums push
determinants past 38 digits: production either mean-centers/rescales
features first or trains per shard and model-averages (the
McDonald et al. 2010 parameter-mixing shape); the exact integer form
here is what makes the cross-engine oracle possible.

Features per document (dense, 3-vector): distinct word count, total
word count, bias. Labels for the oracled entry come from a
deterministic in-corpus rule (the Gopher unique-word-fraction gate
``10·uniq ≥ 4·total``) — the OPERATOR under test is the train+score
plan, not the label source; the rule is linear in the features, so the
trained plane should (and does) recover it almost exactly, which makes
the entry self-validating: a broken solve craters the confusion matrix.

Reference analog: quality gating before publish
(operator-tools validation hooks; SURVEY.md §2.11 T7) — upgraded from a
fixed rule to a trained model, the beyond-reference training-data
operator family.
"""

from __future__ import annotations

from data_pipeline_spark.operators.dedup import DUCK, SPARK  # noqa: F401 (DUCK re-exported for oracle callers)


def _i128(expr: str, dialect: str) -> str:
    t = "DECIMAL(38,0)" if dialect == SPARK else "HUGEINT"
    return f"CAST({expr} AS {t})"


def _words(dialect: str, docs_rel: str) -> str:
    if dialect == SPARK:
        return (
            f"words AS (SELECT doc_id, w FROM {docs_rel} "
            f"LATERAL VIEW explode(split(text, ' ')) t AS w)"
        )
    return (
        f"words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        f"FROM {docs_rel})"
    )


def ls_classifier_sql(
    dialect: str,
    docs_rel: str = "documents",
    ridge: int = 1,
) -> str:
    """Train the ridge least-squares plane on (uniq, total, 1) → ±1 and
    score every document, emitting the confusion matrix against the
    label rule with per-cell feature bounds. One corpus aggregate (the
    normal equations), one scalar CTE (the four 3×3 determinants), one
    scoring pass — the whole train+infer loop in a single plan."""
    i = lambda e: _i128(e, dialect)  # noqa: E731
    # final projection leaves 128-bit land in BOTH dialects: Spark's
    # natives here are DECIMAL(38,0) and DuckDB's HUGEINT — an uncast
    # output would hash differently across engines
    big = lambda e: f"CAST({e} AS BIGINT)"  # noqa: E731
    return f"""
        WITH {_words(dialect, docs_rel)},
        d AS (
          SELECT doc_id,
                 {i('count(DISTINCT w)')} AS u,
                 {i('count(w)')} AS t,
                 CASE WHEN 10 * count(DISTINCT w) >= 4 * count(w)
                      THEN {i('1')} ELSE {i('-1')} END AS y
          FROM words GROUP BY doc_id),
        s AS (
          SELECT SUM(u*u) + {ridge} AS suu, SUM(u*t) AS sut, SUM(u) AS su,
                 SUM(t*t) + {ridge} AS stt, SUM(t) AS st,
                 COUNT(*) + {ridge} AS n,
                 SUM(u*y) AS buy, SUM(t*y) AS bty, SUM(y) AS by_
          FROM d),
        dets AS (
          SELECT
            suu*(stt*n - st*st) - sut*(sut*n - st*su)
              + su*(sut*st - stt*su) AS det_a,
            buy*(stt*n - st*st) - sut*(bty*n - st*by_)
              + su*(bty*st - stt*by_) AS det_u,
            suu*(bty*n - by_*st) - buy*(sut*n - st*su)
              + su*(sut*by_ - bty*su) AS det_t,
            suu*(stt*by_ - st*bty) - sut*(sut*by_ - su*bty)
              + buy*(sut*st - stt*su) AS det_b
          FROM s),
        scored AS (
          SELECT d.doc_id, d.u, d.t, d.y,
                 CASE WHEN ((dt.det_u * d.u + dt.det_t * d.t + dt.det_b)
                            > 0) = (dt.det_a > 0)
                      THEN 1 ELSE -1 END AS predicted
          FROM d CROSS JOIN dets dt)
        SELECT {big('y')} AS label, {big('predicted')} AS predicted,
               {big('count(*)')} AS n_docs,
               {big('min(u)')} AS min_uniq, {big('max(u)')} AS max_uniq,
               {big('min(t)')} AS min_total, {big('max(t)')} AS max_total
        FROM scored
        GROUP BY y, predicted
    """
