"""Fixture serializers — reproduce the reference's on-disk output formats
byte-for-byte so stage outputs can be diffed against its committed goldens.

  constraint_cardinality_lines   'p maxN n1;rate1 n2;rate2 ...'
                                 (constraint_mining.py:41-69 writer; sample
                                 Data/Constraint_Cardinality.txt:1-3)
  constraint_range_lines         'p c1;rate1 c2;rate2 ...' sorted by rate
                                 desc (constraint_mining.py:101-119)
  predictions_wide_lines         '"s","p","l","e1 score1",...,"eK scoreK"'
                                 right-padded with '' and %.4f scores
                                 (predict.py:203-208)
  write_openke_benchmark         entity2id/relation2id/train2id/valid2id/
                                 test2id with leading count headers — the
                                 OpenKE trainer interop format
                                 (DBP-Lite/predict_embedding.py:43-83)

These run at export time only — the engine keeps everything long-format
(SURVEY §1.5); padding/wide layout never exists inside the DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def constraint_cardinality_lines(card: DataFrame) -> DataFrame:
    """card(p, n, rate, max_n) -> (p, line) in the reference line format.
    Distribution entries ordered by n asc (the reference iterates the
    counted dict in key order)."""
    pairs = card.groupBy("p", "max_n").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("n", "rate"))),
                lambda s: F.concat_ws(
                    ";", s["n"].cast("string"), F.format_number(s["rate"], 4)
                ),
            ),
            " ",
        ).alias("dist")
    )
    return pairs.select(
        "p",
        F.concat_ws(" ", F.col("p"), F.col("max_n").cast("string"), F.col("dist")).alias("line"),
    )


def constraint_range_lines(rng: DataFrame, kind: str = "con") -> DataFrame:
    """rng(p, kind, class, rate) -> (p, line): classes sorted rate desc,
    tie-break class asc (reference sorts by value desc,
    constraint_mining.py:101-115)."""
    rows = rng.filter(F.col("kind") == kind)
    w = Window.partitionBy("p").orderBy(F.desc("rate"), F.asc("class"))
    ordered = rows.withColumn("rk", F.row_number().over(w))
    return (
        ordered.groupBy("p")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "class", "rate"))),
                    lambda s: F.concat_ws(
                        ";", s["class"], F.format_number(s["rate"], 4)
                    ),
                ),
                " ",
            ).alias("dist")
        )
        .select("p", F.concat_ws(" ", F.col("p"), F.col("dist")).alias("line"))
    )


def predictions_wide_lines(predictions: DataFrame, k: int = 30) -> DataFrame:
    """(s,p,l,entity,score,rank) -> one quoted CSV line per triple, top-k
    'entity score' cells right-padded with '' (predict.py:203-208)."""
    cells = predictions.filter(F.col("rank") <= k).withColumn(
        "cell",
        F.concat_ws(" ", F.col("entity"), F.format_number(F.col("score"), 4)),
    )
    grouped = cells.groupBy("subject", "predicate", "literal").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "cell"))),
            lambda s: s["cell"],
        ).alias("cells")
    )
    padded = grouped.withColumn(
        "cells",
        F.slice(
            F.concat("cells", F.array_repeat(F.lit(""), k)), 1, k
        ),
    )
    quote = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731
    return padded.select(
        F.concat_ws(
            ",",
            quote(F.col("subject")),
            quote(F.col("predicate")),
            quote(F.col("literal")),
            F.array_join(F.transform("cells", lambda c: F.concat(F.lit('"'), c, F.lit('"'))), ","),
        ).alias("line")
    )


def _write_headed(path: str, lines, n: int) -> None:
    """OpenKE's headed-text convention: first line = row count, then one
    record per line. The format itself is a single text file (it feeds an
    external single-node trainer), so the writer streams rows through the
    driver with toLocalIterator — never materializing the DataFrame in
    driver memory; id assignment and line formatting stay distributed."""
    with open(path, "w") as fh:
        fh.write("%d\n" % n)
        for r in lines:
            fh.write(r[0])
            fh.write("\n")


def write_openke_benchmark(
    triples: DataFrame,
    out_dir: str,
    valid_size: int = 0,
    s: str = "subject",
    p: str = "predicate",
    o: str = "object",
) -> dict:
    """S10 sink format: emit an OpenKE benchmark directory —
    entity2id.txt / relation2id.txt (``label\\tid`` after a count header)
    and train2id.txt / valid2id.txt / test2id.txt (``sid oid pid`` — the
    reference writes subject, OBJECT, predicate in that order,
    DBP-Lite/predict_embedding.py:70-74) — from a triple DataFrame.

    Differences from the reference, by design: ids come from
    dictionary_encode (dense, value-ordered, deterministic) instead of
    Python set() enumeration order, and the valid split takes the lowest
    stable_hash32(s,p,o) triples instead of random.shuffle
    (predict_embedding.py:76-80) so reruns are bit-stable (FIXTURES.md §7).
    test2id.txt is a copy of valid2id.txt exactly as the reference does
    (predict_embedding.py:77-79). Returns {file: row count}.
    """
    import os

    from ..functions.text import stable_hash32
    from .sampling import dictionary_encode

    os.makedirs(out_dir, exist_ok=True)
    t = triples.select(
        F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o")
    )
    ents = t.select(F.col("s").alias("v")).unionByName(
        t.select(F.col("o").alias("v"))
    )
    e2id = dictionary_encode(ents, "v", id_col="eid")
    r2id = dictionary_encode(t.select(F.col("p").alias("v")), "v", id_col="rid")

    counts: dict = {}
    n_e = e2id.count()
    n_r = r2id.count()
    _write_headed(
        os.path.join(out_dir, "entity2id.txt"),
        e2id.orderBy("eid")
        .select(F.concat_ws("\t", "v", F.col("eid").cast("string")))
        .toLocalIterator(),
        n_e,
    )
    _write_headed(
        os.path.join(out_dir, "relation2id.txt"),
        r2id.orderBy("rid")
        .select(F.concat_ws("\t", "v", F.col("rid").cast("string")))
        .toLocalIterator(),
        n_r,
    )
    counts["entity2id.txt"] = n_e
    counts["relation2id.txt"] = n_r

    ids = (
        t.join(e2id.select(F.col("v").alias("s"), F.col("eid").alias("sid")), "s")
        .join(e2id.select(F.col("v").alias("o"), F.col("eid").alias("oid")), "o")
        .join(r2id.select(F.col("v").alias("p"), F.col("rid").alias("pid")), "p")
        .withColumn("__h", stable_hash32(F.concat_ws("\t", "s", "p", "o")))
    )
    # reference line order: '%d %d %d' % (sid, oid, pid)
    line = F.concat_ws(
        " ",
        F.col("sid").cast("string"),
        F.col("oid").cast("string"),
        F.col("pid").cast("string"),
    )
    n_t = ids.count()
    _write_headed(
        os.path.join(out_dir, "train2id.txt"),
        ids.orderBy("sid", "oid", "pid").select(line).toLocalIterator(),
        n_t,
    )
    counts["train2id.txt"] = n_t

    n_v = min(valid_size, n_t)
    valid = (
        ids.orderBy("__h", "sid", "oid", "pid").limit(n_v)
        if n_v
        else ids.limit(0)
    )
    _write_headed(
        os.path.join(out_dir, "valid2id.txt"),
        valid.orderBy("sid", "oid", "pid").select(line).toLocalIterator(),
        n_v,
    )
    import shutil

    shutil.copyfile(
        os.path.join(out_dir, "valid2id.txt"),
        os.path.join(out_dir, "test2id.txt"),
    )
    counts["valid2id.txt"] = n_v
    counts["test2id.txt"] = n_v
    return counts
