"""Feature encoders (SURVEY.md §2.8 M1/M3).

label_encode  — M1 (util_encode.py:16-58, Lib/util_wv.py:22-55): tokenize
    (subject-name, property-name, literal), pad/truncate each to fixed
    lengths, look every token up in a word-vector table, concatenate to one
    flat array<float> of length (ls+lp+ll)*dim. The word-vector table joins
    in as a broadcast dimension and the batch assembly is one Arrow pass —
    the reference's per-row numpy loop becomes a vectorized gather.

rdf2vec_encode — M3 (util_encode.py:241-262): one_hot(p) ++ vec(s) ++
    vec(o), zeros for missing vectors (J10) — pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import localname_to_text, pad_tokens, tokenize, uri_localname

PAD = "\x00"


def label_encode(
    triples: DataFrame,
    word_vectors: DataFrame,  # (word string, vec array<float>)
    dim: int,
    seq_lens: tuple[int, int, int] = (12, 4, 15),
) -> DataFrame:
    """-> triples + feature array<float> of length sum(seq_lens)*dim.

    Reference seq-len defaults 12,4,15 (predict.py:52). Unknown / pad
    tokens encode as zero vectors (util_wv.py:40-55 'NaN' handling).

    Fully distributed: tokens posexplode and equi-join the word-vector
    TABLE (Catalyst broadcasts it when small, shuffle-joins it when the
    vocabulary is billions of rows — no driver collect, no closure-shipped
    dict), then the flat feature assembles with one ordered
    collect_list/flatten. Stays JVM-side end to end.

    Determinism: the feature is a pure function of the padded token array,
    so it is computed once per DISTINCT token array keyed by a
    content-derived sha256 (never monotonically_increasing_id — that id is
    partition-order-dependent, and a self-join over it can desync across
    shuffles / task retries and attach features to the wrong rows). The
    distinct pass also dedups hot literals: a token sequence appearing a
    million times costs one word-vector join row.
    """
    ls, lp, ll = seq_lens
    toks = (
        F.concat(
            pad_tokens(tokenize(localname_to_text(uri_localname("subject"))), ls),
            pad_tokens(tokenize(localname_to_text(uri_localname("predicate"))), lp),
            pad_tokens(tokenize(F.col("literal")), ll),
        )
    )
    # \x01 separator never collides with PAD (\x00) or tokens (alnum only)
    key = F.sha2(F.concat_ws("\x01", F.col("__toks")), 256)
    with_toks = triples.withColumn("__toks", toks).withColumn("__key", key)

    zeros = F.array_repeat(F.lit(0.0).cast("float"), dim)
    wv = word_vectors.select(
        F.col("word").alias("__word"), F.col("vec").alias("__vec")
    )
    features = (
        with_toks.select("__key", "__toks")
        .dropDuplicates(["__key"])
        .select("__key", F.posexplode("__toks").alias("__pos", "__word"))
        .join(wv, "__word", "left")
        .select("__key", "__pos", F.coalesce("__vec", zeros).alias("__v"))
        .groupBy("__key")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__v"))),
                    lambda x: x["__v"],
                )
            ).alias("feature")
        )
    )
    return with_toks.join(features, "__key").drop("__toks", "__key")


def rdf2vec_encode(
    triples: DataFrame,
    entity_vectors: DataFrame,  # (id string, vec array<float>)
    dim: int,
    predicates: list[str],
) -> DataFrame:
    """-> triples + feature = one_hot(p) ++ vec(s) ++ vec(o); zeros for
    missing vectors. Pure column exprs — stays in codegen."""
    zero = F.array_repeat(F.lit(0.0).cast("float"), dim)
    onehot = F.array(
        *[
            F.when(F.col("predicate") == p, F.lit(1.0).cast("float"))
            .otherwise(F.lit(0.0).cast("float"))
            for p in predicates
        ]
    )
    sv = entity_vectors.select(
        F.col("id").alias("subject"), F.col("vec").alias("s_vec")
    )
    ov = entity_vectors.select(
        F.col("id").alias("object"), F.col("vec").alias("o_vec")
    )
    return (
        triples.join(F.broadcast(sv), "subject", "left")
        .join(F.broadcast(ov), "object", "left")
        .withColumn(
            "feature",
            F.concat(
                onehot,
                F.coalesce("s_vec", zero),
                F.coalesce("o_vec", zero),
            ),
        )
        .drop("s_vec", "o_vec")
    )
