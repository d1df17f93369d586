"""Stage 2a — candidate entity generation (replaces the reference's remote
lookup API, SURVEY.md S7 -> J1).

assertions(subject, predicate, literal) x entity_label(entity, label)
    -> candidates(literal_norm, entity, lex_score, rank)   [rank 1..k]

Semantics re-expressed from cache.py:54-88 (literal -> ordered top-30
candidate list) and util_kb.py:17-65 (lookup by label text): candidates are
entities whose label shares tokens with the literal, ranked by Jaccard
overlap with exact-match forced to the top, deterministic tie-break
(score desc, entity asc) per FIXTURES.md §7.

Scale design (the literal side is heavily skewed — hot literals like
"Baku"/"Paris" repeat): candidate generation runs over *distinct* literals
only (exactly what the reference's Lookup_Cache memoizes), so a hot literal
costs one row in this stage; the fan-back-out to assertions is a later join
where AQE skew-split applies. The token inverted index is the shuffle key —
tokens are diverse, so no hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokenize
from ..operators.topk import topk_per_group


def generate_candidates(
    assertions: DataFrame, entity_label: DataFrame, k: int = 30
) -> DataFrame:
    lits = (
        assertions.select(normalize_text("literal").alias("literal_norm"))
        .distinct()
        .withColumn("lit_tokens", F.array_distinct(tokenize("literal_norm")))
        .withColumn("n_lit", F.size("lit_tokens"))
    )
    labs = (
        entity_label.select("entity", normalize_text("label").alias("label_norm"))
        .distinct()
        .withColumn("lab_tokens", F.array_distinct(tokenize("label_norm")))
        .withColumn("n_lab", F.size("lab_tokens"))
    )

    # token inverted index join (distinct tokens per side to count overlap)
    lit_tok = lits.select(
        "literal_norm", "n_lit", F.explode("lit_tokens").alias("tok")
    )
    lab_tok = labs.select(
        "entity", "label_norm", "n_lab", F.explode("lab_tokens").alias("tok")
    )
    overlap = (
        lit_tok.join(lab_tok, "tok")
        .groupBy("literal_norm", "n_lit", "entity", "label_norm", "n_lab")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    scored = overlap.select(
        "literal_norm",
        "entity",
        F.when(F.col("literal_norm") == F.col("label_norm"), F.lit(1.0))
        .otherwise(
            F.col("inter") / (F.col("n_lit") + F.col("n_lab") - F.col("inter"))
        )
        .alias("lex_score"),
    )
    return topk_per_group(
        scored,
        ["literal_norm"],
        [F.desc("lex_score"), F.asc("entity")],
        k,
    )
