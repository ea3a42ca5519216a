"""Text analysis for training-data curation: language-ID + quality scoring.

Language-ID is the classic marker-lexicon heuristic (count stopword-ish
substrings per language, argmax with a fixed tiebreak). Pure string
functions from the common Spark/DuckDB dialect subset — ONE SQL text serves
both engines, so the oracle is the same string. No UDF: at 100 TB this is
a codegen'd projection over the scan, shuffle-free.
"""

from __future__ import annotations

from data_pipeline_spark.extraction import LANG_MARKERS


def _occurrences(padded: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{m}', ''))) "
        f"/ {len(marker)} AS BIGINT)"
    )


def langid_sql(docs_rel: str = "documents") -> str:
    """Per-doc predicted language + per-language marker scores.

    Argmax tiebreak: languages checked in sorted order, first max wins —
    the reference's deterministic-mode lesson (tie → fixed order,
    scripts/storage_tier_utils.py:104-140)."""
    langs = sorted(LANG_MARKERS)
    scores = ", ".join(
        "("
        + " + ".join(_occurrences("padded", m) for m in LANG_MARKERS[lang])
        + f") AS s_{lang}"
        for lang in langs
    )
    # lang L wins if its score >= every later lang's score and > every
    # earlier lang's score (strict vs earlier == first-max-wins).
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > s_{o}" for o in langs[:i]] + [
            f"s_{lang} >= s_{o}" for o in langs[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    score_cols = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
        WITH padded AS (
          SELECT doc_id, lang AS tagged_lang,
                 concat(' ', lower(text), ' ') AS padded
          FROM {docs_rel}
        ),
        scored AS (SELECT doc_id, tagged_lang, {scores} FROM padded)
        SELECT doc_id, tagged_lang, {score_cols}, {case} AS lang_pred
        FROM scored
    """
