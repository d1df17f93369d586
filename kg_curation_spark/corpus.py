"""Adapters from the driver's testdata tables to the engine's input shape.

``documents(doc_id, text, lang, source, n_chars)`` stands in for the
repos-content corpus (FIXTURES.md §6): each document becomes one source
file whose content carries deterministically planted assertion lines
derived from the document's own fields, so the extract stage has real work
to do and the planted set is exactly reconstructible for oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS = "http://example.org/doc/"
NP = "http://example.org/prop/"


def documents_as_repos(documents: DataFrame) -> DataFrame:
    """documents -> repos(repo, path, commit, lang, content).

    content = the document text plus two planted assertion lines:
      (doc/<id>, prop/source, "<source>")
      (doc/<id>, prop/lang,   "<lang>")
    """
    line1 = F.format_string(
        'KG: <%sdoc_%d> <%ssource> "%s" .', F.lit(NS), "doc_id", F.lit(NP), "source"
    )
    line2 = F.format_string(
        'KG: <%sdoc_%d> <%slang> "%s" .', F.lit(NS), "doc_id", F.lit(NP), "lang"
    )
    # documents ships as one parquet file -> one input split; spread it so
    # the downstream Arrow extraction UDF runs on every core
    spread = documents.repartition(64, "doc_id")
    return spread.select(
        F.concat(F.lit("corpus/"), "source").alias("repo"),
        F.format_string("docs/%06d.txt", "doc_id").alias("path"),
        F.sha2(F.format_string("%d", "doc_id"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.concat_ws("\n", line1, line2, F.col("text")).alias("content"),
    )
