"""F7 word2vec-cosine candidate lane (cache_word2vec.py:50-63,107)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kg_curation_spark.stages.candidates import generate_candidates
from kg_curation_spark.stages.lc_pipeline import load_slite


def _hash_word_vectors(spark, labels, dim=16):
    """Deterministic +/-1 'word2vec' over the label corpus vocabulary —
    random-ish directions make avg-pool cosine track token overlap."""
    from kg_curation_spark.functions.text import normalize_text, tokenize

    vocab = (
        labels.select(F.explode(tokenize(normalize_text("label"))).alias("word"))
        .distinct()
    )
    vec = F.array(
        *[
            F.when(F.xxhash64(F.concat(F.col("word"), F.lit(str(i)))) % 2 == 0, 1.0)
            .otherwise(-1.0)
            .cast("float")
            for i in range(dim)
        ]
    )
    return vocab.withColumn("vec", vec)


def _recall_at_30(cands, quads):
    from kg_curation_spark.functions.text import normalize_text

    gold = quads.select(
        normalize_text("literal").alias("literal_norm"),
        F.col("source_entity").alias("entity"),
    ).distinct()
    hit = gold.join(cands, ["literal_norm", "entity"], "left_semi").count()
    return hit / gold.count()


def test_w2v_lane_recovers_recall_when_lexical_lane_is_handicapped(spark):
    """Handicap: every literal gets a noise token (kills the exact lane)
    and max_token_df=0 drops ALL tokens from the inverted index (kills the
    fuzzy lane). Without the w2v lane recall collapses; with it, the
    avg-pool cosine lane restores recall@30 to the candidate gate."""
    quads, _types = load_slite(spark)
    noisy = quads.withColumn(
        "literal", F.concat(F.col("literal"), F.lit(" zzqnoise"))
    ).cache()
    entity_label = quads.select(
        F.col("source_entity").alias("entity"), F.col("literal").alias("label")
    ).distinct()
    gold_quads = noisy.select("subject", "predicate", "literal", "source_entity")

    crippled = generate_candidates(
        gold_quads, entity_label, k=30, max_token_df=0
    )
    r_crippled = _recall_at_30(crippled, gold_quads)

    wv = _hash_word_vectors(spark, entity_label, dim=16)
    with_lane = generate_candidates(
        gold_quads, entity_label, k=30, max_token_df=0, word_vectors=wv
    )
    r_lane = _recall_at_30(with_lane, gold_quads)

    assert r_crippled < 0.2, r_crippled
    assert r_lane >= 0.95, (r_crippled, r_lane)


def test_w2v_lane_does_not_hurt_full_candidates(spark):
    quads, _types = load_slite(spark)
    entity_label = quads.select(
        F.col("source_entity").alias("entity"), F.col("literal").alias("label")
    ).distinct()
    wv = _hash_word_vectors(spark, entity_label, dim=16)
    both = generate_candidates(quads, entity_label, k=30, word_vectors=wv)
    assert _recall_at_30(both, quads) >= 0.95
