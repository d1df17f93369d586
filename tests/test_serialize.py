"""Reference output-format parity (shape of committed golden files)."""

from __future__ import annotations

from kg_curation_spark.stages.serialize import (
    constraint_cardinality_lines,
    constraint_range_lines,
    predictions_wide_lines,
)


def test_cardinality_line_format(spark):
    card = spark.createDataFrame(
        [("p:a", 1, 0.75, 2), ("p:a", 2, 0.25, 2), ("p:b", 1, 1.0, 1)],
        "p string, n int, rate double, max_n int",
    )
    lines = {r["p"]: r["line"] for r in constraint_cardinality_lines(card).collect()}
    assert lines["p:a"] == "p:a 2 1;0.7500 2;0.2500"
    assert lines["p:b"] == "p:b 1 1;1.0000"


def test_range_line_sorted_by_rate_desc(spark):
    rng = spark.createDataFrame(
        [("p:a", "con", "c:X", 0.2), ("p:a", "con", "c:Y", 0.8),
         ("p:a", "gen", "c:Z", 1.0)],
        "p string, kind string, class string, rate double",
    )
    lines = {r["p"]: r["line"] for r in constraint_range_lines(rng, "con").collect()}
    assert lines["p:a"] == "p:a c:Y;0.8000 c:X;0.2000"


def test_predictions_wide_padding(spark):
    preds = spark.createDataFrame(
        [("s", "p", "l", "e1", 0.91234, 1), ("s", "p", "l", "e2", 0.5, 2)],
        "subject string, predicate string, literal string, entity string, score double, rank int",
    )
    line = predictions_wide_lines(preds, k=4).first()["line"]
    assert line.startswith('"s","p","l","e1 0.9123","e2 0.5000","",""')


def test_transh_predictions_reproduce_golden_shape(spark):
    """End-to-end shape parity with the committed TransH golden file
    (DBP-Lite/Data/Predicts_TransH.csv:1-2): score candidates with the
    TransH scorer, rank desc, serialize wide — one quoted CSV line per
    triple, cells '"entity score"' with %.4f scores in rank order."""
    import re

    import pyspark.sql.functions as F

    from kg_curation_spark.functions.scoring import with_transh_score
    from kg_curation_spark.operators.topk import topk_per_group

    vec = lambda seed: [float((seed * 7 + i) % 5) - 2.0 for i in range(4)]  # noqa: E731
    rows = [
        ("d:s1", "d:p", "Baku", f"d:e{i}", vec(1), vec(2), vec(10 + i), vec(3))
        for i in range(5)
    ]
    cand = spark.createDataFrame(
        rows,
        "subject string, predicate string, literal string, entity string, "
        "hv array<float>, rv array<float>, tv array<float>, wv array<float>",
    )
    scored = with_transh_score(cand, "hv", "rv", "tv", "wv", dim=4)
    ranked = topk_per_group(
        scored.select("subject", "predicate", "literal", "entity", "score"),
        ["subject", "predicate", "literal"],
        [F.desc("score"), F.asc("entity")],
        k=30,
    )
    line = predictions_wide_lines(ranked, k=30).first()["line"]
    # same grammar as the golden file: "s","p","literal","<uri> 0.9961",...
    assert line.startswith('"d:s1","d:p","Baku","d:e')
    cells = re.findall(r'"d:e\d \d\.\d{4}"', line)
    assert len(cells) == 5
    scores = [float(c.split()[-1].rstrip('"')) for c in cells]
    assert scores == sorted(scores, reverse=True)
    assert line.count('""') == 25  # right-padded to k=30 like the golden


def test_transh_native_equals_arrow_udf(spark):
    """with_transh_score (pure-Column) == transh_score (Arrow UDF) to 1e-9,
    including the zeros-for-missing J10 path."""
    import pyspark.sql.functions as F

    from kg_curation_spark.functions.scoring import transh_score, with_transh_score

    import random

    rng = random.Random(7)
    mk = lambda: [rng.uniform(-1, 1) for _ in range(8)]  # noqa: E731
    rows = [(i, mk(), mk(), mk(), mk()) for i in range(64)]
    rows.append((64, None, mk(), mk(), mk()))  # missing vector -> zeros
    df = spark.createDataFrame(
        rows,
        "i int, hv array<float>, rv array<float>, tv array<float>, wv array<float>",
    )
    zeros = F.array_repeat(F.lit(0.0).cast("float"), 8)
    filled = df.select(
        "i",
        F.coalesce("hv", zeros).alias("hv"), F.col("rv"),
        F.col("tv"), F.col("wv"),
    )
    native = {r["i"]: r["score"] for r in
              with_transh_score(filled, "hv", "rv", "tv", "wv", dim=8).collect()}
    arrow = {r["i"]: r["s"] for r in
             df.select("i", transh_score("hv", "rv", "tv", "wv").alias("s")).collect()}
    assert len(native) == 65
    for i, v in native.items():
        assert abs(v - arrow[i]) < 1e-6, (i, v, arrow[i])


def test_openke_benchmark_files(spark, tmp_path):
    """Byte-shape parity with the reference's OpenKE benchmark convention
    (DBP-Lite/predict_embedding.py:43-83; committed sample
    OpenKE/benchmarks/DBP/relation2id.txt:1 carries the same count
    header): count header first, 'label\\tid' maps, 'sid oid pid' triple
    files, test2id a copy of valid2id."""
    import re

    from kg_curation_spark.stages.serialize import write_openke_benchmark

    triples = spark.createDataFrame(
        [
            ("e_ann", "p_knows", "e_bob"),
            ("e_bob", "p_knows", "e_cid"),
            ("e_cid", "p_likes", "e_ann"),
            ("e_ann", "p_likes", "e_dee"),
        ],
        "subject string, predicate string, object string",
    )
    out = str(tmp_path / "bench")
    counts = write_openke_benchmark(triples, out, valid_size=2)
    assert counts == {
        "entity2id.txt": 4, "relation2id.txt": 2,
        "train2id.txt": 4, "valid2id.txt": 2, "test2id.txt": 2,
    }

    def read(fn):
        with open(f"{out}/{fn}") as fh:
            lines = fh.read().splitlines()
        assert int(lines[0]) == len(lines) - 1, fn  # count header
        return lines[1:]

    ents = read("entity2id.txt")
    rels = read("relation2id.txt")
    assert all(re.fullmatch(r"\S+\t\d+", l) for l in ents + rels)
    e2id = dict(l.split("\t") for l in ents)
    r2id = dict(l.split("\t") for l in rels)
    # dense, value-ordered ids (the rebuild's determinism upgrade)
    assert sorted(int(i) for i in e2id.values()) == [0, 1, 2, 3]
    assert [k for k, _ in sorted(e2id.items(), key=lambda kv: int(kv[1]))] == sorted(e2id)

    train = read("train2id.txt")
    assert all(re.fullmatch(r"\d+ \d+ \d+", l) for l in train)
    # reference cell order is (sid, OID, pid) — decode back and compare
    inv_e = {v: k for k, v in e2id.items()}
    inv_r = {v: k for k, v in r2id.items()}
    decoded = {
        (inv_e[a], inv_r[c], inv_e[b])
        for a, b, c in (l.split() for l in train)
    }
    assert decoded == {tuple(r) for r in triples.collect()}

    valid = read("valid2id.txt")
    assert set(valid) <= set(train) and len(valid) == 2
    with open(f"{out}/valid2id.txt", "rb") as a, open(f"{out}/test2id.txt", "rb") as b:
        assert a.read() == b.read()

    # deterministic across reruns (stable-hash split, no RNG)
    out2 = str(tmp_path / "bench2")
    write_openke_benchmark(triples, out2, valid_size=2)
    for fn in counts:
        with open(f"{out}/{fn}", "rb") as a, open(f"{out2}/{fn}", "rb") as b:
            assert a.read() == b.read(), fn
