"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard. All hashing uses the md5-based
``stable_hash32`` so DuckDB oracles reproduce signatures bit-for-bit.

Scale notes
-----------
* exact_dedup: one shuffle on the content hash; map-side combine applies.
* minhash: |docs| x |shingles| exploded once, seeds joined as a tiny
  broadcast grid; the groupBy key (doc, seed) is uniform — no hot keys.
* LSH pairs: the join key is (band, bucket); bucket sizes are the classic
  skew risk (near-identical boilerplate docs collapse into one bucket), so
  the pair join caps bucket size (``max_bucket``) exactly like production
  near-dup systems drop degenerate buckets.
* simhash: ``simhash64_arrow`` is the scale path — token hashes stay
  JVM-side, the signature is ONE vectorized numpy bit-pack per Arrow batch
  (linear in tokens, no row blowup). ``simhash64`` is the explode form:
  tokens x bit-positions (a 32x row multiplication), kept because it is
  oracle-checkable bit-for-bit in DuckDB; both produce identical
  signatures (equivalence pytest + the Arrow form shares the same oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text, stable_hash32, tokenize, word_ngrams


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """-> (content_hash, keeper, n_dupes): keeper = min id per hash."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(content_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keeper"), F.count(F.lit(1)).alias("n_dupes"))
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, char_level: bool = False
) -> DataFrame:
    """-> (id, shingle) distinct word-k-gram (or char-k) shingles.

    The token array / normalized text is materialized into a column BEFORE
    the n-gram transform: Catalyst does not eliminate common subexpressions
    inside higher-order-function lambdas, so inlining tokenize() there
    re-runs the whole regex chain once per n-gram index (O(len^2) — measured
    10 s for 5000 docs before this fix, <1 s after)."""
    if char_level:
        base = df.select(
            F.col(id_col).alias("id"), normalize_text(text_col).alias("__nt")
        )
        sh = F.when(
            F.length("__nt") >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("__nt") - (k - 1)),
                    lambda i: F.col("__nt").substr(i, F.lit(k)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        base = df.select(
            F.col(id_col).alias("id"), tokenize(text_col).alias("__toks")
        )
        sh = F.array_distinct(word_ngrams(F.col("__toks"), k))
    return base.select("id", F.explode(sh).alias("shingle")).distinct()


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 8
) -> DataFrame:
    """(id, shingle) -> (id, seed, minhash); seed in [0, n_hashes).

    All n_hashes minima are computed in ONE hash aggregate over the shingle
    table (map-side combinable, no seed crossJoin / row blowup); the wide
    row is unpivoted with ``stack`` afterwards — at web scale the shuffle
    carries |docs| rows, not |docs| x |shingles| x n_hashes.
    """
    aggs = [
        F.min(stable_hash32(F.col("shingle"), seed=s)).alias(f"m{s}")
        for s in range(n_hashes)
    ]
    wide = shingles.groupBy("id").agg(*aggs)
    stack = ", ".join(f"{s}L, m{s}" for s in range(n_hashes))
    return wide.selectExpr(
        "id", f"stack({n_hashes}, {stack}) as (seed, minhash)"
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, max_bucket: int = 1000
) -> DataFrame:
    """(id, seed, minhash) -> (id_a, id_b) pairs sharing >=1 LSH band.

    band = seed div rows_per_band; bucket key = the band's minhash vector
    serialized in seed order. Degenerate buckets (> max_bucket members,
    e.g. empty-text boilerplate) are dropped — at corpus scale one such
    bucket would otherwise produce a quadratic pair explosion.
    """
    n_hashes = signatures.agg(F.max("seed")).first()[0] + 1
    rows_per_band = n_hashes // bands
    buckets = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seed", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
                "_",
            ).alias("bucket")
        )
    )
    # bucket-size gate as an aggregate + semi-join (cheaper than a window:
    # no per-bucket sort); singleton buckets are pruned too — they cannot
    # produce pairs, and they are the vast majority of buckets.
    ok_buckets = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .filter((F.col("bsize") >= 2) & (F.col("bsize") <= max_bucket))
        .select("band", "bucket")
    )
    sized = buckets.join(ok_buckets, ["band", "bucket"], "left_semi")
    a = sized.select("band", "bucket", F.col("id").alias("id_a"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """-> (id, simhash): per-token stable hash, sign-sum per bit position.

    JVM-side explode form (oracle-checkable); the 100 TB path is the same
    math as one numpy pass in mapInPandas — see module docstring.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(text_col)).alias("tok"),
    ).withColumn("h", stable_hash32(F.col("tok")))
    positions = df.sparkSession.range(bits).select(F.col("id").alias("bit"))
    # shiftright/shiftleft take literal shift amounts only; 2^bit via pow
    # (exact in double up to 2^52) keeps the shift-by-column JVM-side.
    p2 = F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
    contrib = toks.crossJoin(F.broadcast(positions)).select(
        "id",
        "bit",
        F.when((F.col("h") / p2).cast("bigint") % 2 == 1, 1).otherwise(-1).alias("c"),
    )
    return (
        contrib.groupBy("id", "bit")
        .agg(F.sum("c").alias("s"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("bigint")).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash64_arrow(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """-> (id, simhash): the 100-TB SimHash path. Identical signatures to
    ``simhash64`` (same per-token stable_hash32, computed JVM-side inside
    a transform — the md5 chain never re-implements in Python), but the
    sign-sum + bit-pack run as ONE vectorized numpy pass per Arrow batch:
    linear in total tokens, versus the explode form's tokens x bits row
    multiplication. Token-less docs are dropped, matching the explode form.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokenize(text_col), lambda t: stable_hash32(t)).alias("__hs"),
    ).filter(F.size("__hs") > 0)
    id_field = hashed.schema["id"]
    schema = StructType([id_field, StructField("simhash", LongType())])
    shifts = np.arange(bits, dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            lens = np.fromiter((len(h) for h in pdf["__hs"]), dtype=np.int64)
            all_h = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in pdf["__hs"]]
            )
            row_idx = np.repeat(np.arange(len(pdf)), lens)
            contrib = (((all_h[:, None] >> shifts) & 1) * 2 - 1).astype(np.int64)
            acc = np.zeros((len(pdf), bits), dtype=np.int64)
            np.add.at(acc, row_idx, contrib)
            sig = ((acc > 0).astype(np.int64) * (np.int64(1) << shifts)).sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "simhash": sig})

    return hashed.mapInPandas(batches, schema=schema)


def ngram_jaccard_pairs(
    shingles: DataFrame, tau: float = 0.5, max_shingle_df: int | None = 1000
) -> DataFrame:
    """(id, shingle) -> (id_a, id_b, jaccard) for pairs with J >= tau.

    Inverted-index self-join on the shingle (equi-join — never a cross
    join). Shingle document frequency is the skew axis: a boilerplate
    shingle shared by 1M docs would make the self-join quadratic, so
    shingles with df > max_shingle_df are dropped IN-operator (stopword
    semantics — removed from both the index and the set sizes, so jaccard
    stays internally consistent), mirroring lsh_candidate_pairs'
    max_bucket cap. Pass None to disable.
    """
    if max_shingle_df is not None:
        hot = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        shingles = shingles.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.select(F.col("id").alias("id_a"), "shingle")
    b = shingles.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= tau)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
