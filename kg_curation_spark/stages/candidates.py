"""Stage 2a — candidate entity generation (replaces the reference's remote
lookup API, SURVEY.md S7 -> J1).

assertions(subject, predicate, literal) x entity_label(entity, label)
    -> candidates(literal_norm, entity, lex_score, rank)   [rank 1..k]

Semantics re-expressed from cache.py:54-88 (literal -> ordered top-30
candidate list) and util_kb.py:17-65 (lookup by label text): candidates are
entities whose label shares tokens with the literal, ranked by Jaccard
overlap with exact-match forced to the top, deterministic tie-break
(score desc, entity asc) per FIXTURES.md §7.

Scale design:
  * candidate generation runs over *distinct* literals only (exactly what
    the reference's Lookup_Cache memoizes) — a hot literal ("Baku" x 1000)
    costs one row here; the fan-back-out is a later AQE-skew-handled join.
  * the token inverted index drops ultra-common tokens (document frequency
    > max_token_df over the label corpus) — the blocking move every
    entity-linking system makes; without it one stop-token ("the", "of",
    or a corpus-wide boilerplate word) makes the index self-join
    quadratic. Exact literal==label matches are recovered by a separate
    direct equi-join on the normalized string, so DF-pruning can never
    lose a perfect match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokenize
from ..operators.topk import topk_per_group


def embedding_candidates(
    assertions: DataFrame,
    entity_label: DataFrame,
    word_vectors: DataFrame,  # (word string, vec array<float>)
    k: int = 30,
) -> DataFrame:
    """F7 second candidate lane (cache_word2vec.py:50-63,107): avg-pool the
    word vectors of the literal's tokens and of every entity label's
    tokens, then exact cosine top-k literal -> entities.

    Pooling is fully distributed: token explode -> word-vector equi-join
    (OOV tokens drop out, reference's `if w in vocab`) -> per-component avg
    via posexplode — no driver materialization of the vocabulary. The
    top-k here is the exact brute-force pass (the reference scans every
    label per literal, cache_word2vec.py:107); at corpus scale swap in
    operators.ann.lsh_cosine_topk — both share the (id, vec) contract.

    -> (literal_norm, entity, cosine) with zero-vector sides dropped
    (reference skips literals/labels with no in-vocab token).
    """
    from ..operators.ann import brute_force_cosine_topk

    wv = word_vectors.select("word", "vec")

    def _avg_pool(df: DataFrame, key: str) -> DataFrame:
        toks = df.select(key, F.explode("toks").alias("word")).join(wv, "word")
        pe = toks.select(key, F.posexplode("vec").alias("pos", "val"))
        return (
            pe.groupBy(key, "pos")
            .agg(F.avg("val").alias("v"))
            .groupBy(key)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda x: x["v"].cast("float"),
                ).alias("embedding")
            )
        )

    lits = (
        assertions.select(normalize_text("literal").alias("literal_norm"))
        .distinct()
        .withColumn("toks", F.array_distinct(tokenize("literal_norm")))
    )
    labs = (
        entity_label.select("entity", normalize_text("label").alias("label_norm"))
        .distinct()
        .withColumn("toks", F.array_distinct(tokenize("label_norm")))
    )
    lit_vec = _avg_pool(lits, "literal_norm").withColumnRenamed(
        "literal_norm", "vec_id"
    )
    lab_vec = _avg_pool(labs, "entity").withColumnRenamed("entity", "vec_id")
    # exclude_self=False: queries are literal strings, neighbors are entity
    # ids — different id domains, so a literal_norm that happens to equal
    # an entity id is a REAL candidate, not a self-pair
    out = brute_force_cosine_topk(lab_vec, lit_vec, k=k, exclude_self=False)
    return out.select(
        F.col("query_id").alias("literal_norm"),
        F.col("neighbor_id").alias("entity"),
        "cosine",
    )


def generate_candidates(
    assertions: DataFrame,
    entity_label: DataFrame,
    k: int = 30,
    max_token_df: int = 1000,
    word_vectors: DataFrame | None = None,
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

    # exact-match lane: direct equi-join, immune to token pruning
    exact = lits.join(
        labs, lits.literal_norm == labs.label_norm
    ).select("literal_norm", "entity", F.lit(1.0).alias("lex_score"))

    # blocking lane: token inverted index with document-frequency pruning
    lab_tok = labs.select(
        "entity", "n_lab", F.explode("lab_tokens").alias("tok")
    )
    tok_df = lab_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # the COMMON set is small by construction (few tokens exceed the cap)
    # -> broadcast anti-join; the rare set can be arbitrarily large.
    common = tok_df.filter(F.col("df") > max_token_df).select("tok")
    lab_tok = lab_tok.join(F.broadcast(common), "tok", "left_anti")
    lit_tok = lits.select(
        "literal_norm", "n_lit", F.explode("lit_tokens").alias("tok")
    ).join(F.broadcast(common), "tok", "left_anti")

    overlap = (
        lit_tok.join(lab_tok, "tok")
        .groupBy("literal_norm", "n_lit", "entity", "n_lab")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    fuzzy = overlap.select(
        "literal_norm",
        "entity",
        (F.col("inter") / (F.col("n_lit") + F.col("n_lab") - F.col("inter"))).alias(
            "lex_score"
        ),
    )

    lanes = exact.unionByName(fuzzy)
    if word_vectors is not None:
        # F7 word2vec-cosine lane, unioned before ranking (the reference
        # keeps Lookup_Cache and word2vec caches as parallel sources)
        emb = embedding_candidates(assertions, entity_label, word_vectors, k=k)
        lanes = lanes.unionByName(
            emb.select("literal_norm", "entity", F.col("cosine").alias("lex_score"))
        )
    scored = lanes.groupBy("literal_norm", "entity").agg(
        F.max("lex_score").alias("lex_score")
    )
    return topk_per_group(
        scored,
        ["literal_norm"],
        [F.desc("lex_score"), F.asc("entity")],
        k,
    )
