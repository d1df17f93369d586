"""Text analysis: langid, quality, fingerprint determinism."""

from __future__ import annotations

import pytest

from kg_curation_spark.textstats import fingerprint, langid, quality_features


def test_langid_markers(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house is here"),
            (2, "der hund und die katze ist das beste"),
            (3, "le chat et la maison est dans les arbres"),
            (4, "xyz qqq zzz"),
        ],
        "doc_id int, text string",
    )
    out = {r["id"]: r["lang_pred"] for r in langid(docs, "doc_id", "text").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_quality_features_bounds_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "A solid sentence, with ten or more reasonable words inside it."),
         (2, ""), (3, "!!! ,,, ...")],
        "doc_id int, text string",
    )
    rows = {r["id"]: r for r in quality_features(docs, "doc_id", "text").collect()}
    assert rows[1]["quality"] == 1.0
    assert rows[2]["n_tokens"] == 0 and rows[2]["mean_token_len"] == 0.0
    assert 0.0 <= rows[3]["punct_ratio"] <= 1.0
    assert rows[3]["quality"] < 1.0


def test_fingerprint_normalization_invariance(spark):
    """Fingerprint is over normalized text: case/punctuation noise keeps
    the same fingerprint, different content changes it."""
    docs = spark.createDataFrame(
        [(1, "Hello World Example"), (2, "hello, WORLD — example!!"),
         (3, "entirely different words")],
        "doc_id int, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in
          fingerprint(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
