"""Golden-score replay — the cheapest end-to-end parity proof against REAL
reference output: load the reference's COMMITTED prediction-score files and
run this engine's typing sweep over them, reproducing the numbers its own
typing.py decision/evaluation step prints (Literal_Canonicalization
README.md:5-10 "to see the final results directly, run typing.py on the
committed score file").

Reference artifacts consumed (data, never code):
  SData_Scores_AttBiRNN_FTF.json               fine-tuned AttBiRNN scores
  Baselines/{S,R}Data_Scores_PropertyRange.json  property-range baseline
  Data/{S,R}Data_Clean.csv                     the literal fixtures
  Data/SData_Type_fixed.json, Data/RData_Type.json   GT type sets
  Cache/class_descendant.json                  class hierarchy (H mode)

Semantics replayed from typing.py:
  * one evaluation unit per CSV ROW (duplicate triples count per row),
    GT keyed by the annotated entity (SData, typing.py:36) or by the
    triple string (RData, typing.py:38)
  * independent mode (typing.py:27-53): predict c iff score(c) >= iota,
    mean P/R/F1 over rows, for every iota in np.arange(0, 1, 0.01)
  * hierarchical mode (typing.py:57-110): Hscore(c) = max over c's
    descendants PRESENT IN THE TRIPLE'S OWN SCORE MAP (typing.py:60-68),
    predict c iff Hscore >= iota and the kappa disjoint margin holds
  * Avg-F1@all / Avg-F1@top5 summary (typing.py:52)

The file parse is driver-side by design: these are committed fixtures
(<2 MB, ~1.7k rows); the sweep itself runs as the engine's one-pass
DataFrame job (stages/typing.py) exactly as it would over a billion-row
score table.
"""

from __future__ import annotations

import csv
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .typing import hierarchical_rollup, kappa_margin_gate, typing_sweep

LC_DIR = "/root/reference/Literal_Canonicalization/Codes/literal_canonicalize"


def load_replay_frames(
    spark: SparkSession,
    data_name: str,
    clean_csv: str,
    scores_json: str,
    gt_json: str,
) -> tuple[DataFrame, DataFrame]:
    """-> (scores(rid, class, score), gt(rid, class)); rid = CSV row index
    (the reference iterates rows, so duplicate triples evaluate per row)."""
    with open(scores_json) as f:
        scores = json.load(f)
    with open(gt_json) as f:
        gt = json.load(f)
    srows, grows = [], []
    with open(clean_csv) as f:
        for i, row in enumerate(csv.reader(f, delimiter=",", quotechar='"')):
            triple_s = " ".join(row[:3])
            gt_key = row[3] if data_name == "SData" else triple_s
            for c, s in scores[triple_s].items():
                srows.append((i, c, float(s)))
            for c in set(gt[gt_key]):
                grows.append((i, c))
    return (
        spark.createDataFrame(srows, "rid int, class string, score double"),
        spark.createDataFrame(grows, "rid int, class string"),
    )


def load_class_descendants(spark: SparkSession, cd_json: str) -> DataFrame:
    """class_descendant.json (class -> descendant list, self-inclusive) ->
    (class, descendant) DF WITHOUT identity pairs (the form
    hierarchical_rollup / kappa_margin_gate expect)."""
    with open(cd_json) as f:
        cd = json.load(f)
    rows = [(c, d) for c, ds in cd.items() for d in ds if d != c]
    return spark.createDataFrame(rows, "class string, descendant string")


def replay_sweep(
    spark: SparkSession,
    data_name: str,
    clean_csv: str,
    scores_json: str,
    gt_json: str,
    grid_values: list[float],
    mode: str = "I",
    kappa: float = 0.0,
    cd_json: str | None = None,
) -> DataFrame:
    """-> (iota, mean_precision, mean_recall, mean_f1) — the exact table
    typing.py prints line by line. mode 'I' = independent, 'H' =
    hierarchical (requires cd_json)."""
    scores, gt = load_replay_frames(
        spark, data_name, clean_csv, scores_json, gt_json
    )
    if mode == "I":
        return typing_sweep(scores, gt, ["rid"], grid_values=grid_values)
    cd = load_class_descendants(spark, cd_json)
    h = hierarchical_rollup(scores, cd, ["rid"])
    # typing.py:60-68 restricts Hscore to classes in the triple's OWN score
    # map (its candidate set); the rollup alone also emits ancestors that
    # were never candidates
    h = h.join(scores.select("rid", "class"), ["rid", "class"], "left_semi")
    gated = kappa_margin_gate(h, cd, ["rid"], kappa=kappa)
    return typing_sweep(
        gated.withColumnRenamed("hscore", "score"),
        gt,
        ["rid"],
        grid_values=grid_values,
    )
