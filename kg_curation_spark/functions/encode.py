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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

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
    """
    ls, lp, ll = seq_lens
    toks = (
        F.concat(
            pad_tokens(tokenize(localname_to_text(uri_localname("subject"))), ls),
            pad_tokens(tokenize(localname_to_text(uri_localname("predicate"))), lp),
            pad_tokens(tokenize(F.col("literal")), ll),
        )
    )
    with_toks = triples.withColumn("__toks", toks)

    wv = {r["word"]: np.asarray(r["vec"], dtype="float32")
          for r in word_vectors.collect()}
    zeros = np.zeros(dim, dtype="float32")
    total = ls + lp + ll

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mats = np.zeros((len(pdf), total * dim), dtype="float32")
            for i, seq in enumerate(pdf["__toks"]):
                mats[i] = np.concatenate(
                    [wv.get(t, zeros) for t in seq]
                )
            out = pdf.drop(columns=["__toks"])
            out["feature"] = list(mats)
            yield out

    schema = StructType(
        [f for f in with_toks.schema.fields if f.name != "__toks"]
        + [StructField("feature", ArrayType(FloatType()))]
    )
    return with_toks.mapInPandas(run, schema=schema)


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
