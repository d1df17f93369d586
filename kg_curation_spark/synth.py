"""Deterministic synthetic KG corpus + fixture tables.

Builds the engine's primary input — an Iceberg-shaped table
``repos(repo, path, commit, lang, content)`` (BASELINE.json input_hint) —
by rendering assertion quads into file content, plus the side tables the
reference keeps as JSON caches (FIXTURES.md §3):

  assertions     (subject, predicate, literal, gt_entity)   — the P/R oracle
  entity_label   (entity, label)
  kb_triples     (s, p, o)
  entity_class   (entity, class)
  class_ancestor (class, ancestor)
  redirects      (entity, equivalent)
  kge            (id, kind, vec)                             — TransE-style vectors

Everything is seeded and pure-functional: same (quads, seed, scale) -> same
bytes. At scale the corpus is generated *distributively* (spark.range ->
column exprs), never driver-side loops.

The quads themselves come either from the reference fixture
(``Assertion_Correction/DBP-Lit_Data/DBP-Lit.csv`` — data used as a
correctness oracle per SURVEY.md §5) or from ``synthetic_quads`` below.
"""

from __future__ import annotations

import csv
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_QUADS = (
    "/root/reference/Assertion_Correction/DBP-Lit_Data/DBP-Lit.csv"
)

QUAD_SCHEMA = "subject string, predicate string, literal string, gt_entity string"

# Content-line shape each planted assertion is rendered to (FIXTURES.md §2).
# Extraction must recover exactly the planted (subject, predicate, literal).
ASSERT_LINE = 'KG: <{s}> <{p}> "{l}" .'

NOISE_WORDS = (
    "def class import return for while if else try except lambda yield "
    "public static void int string float struct impl trait match let mut"
).split()


# ---------------------------------------------------------------------------
# Quad fixtures


def load_reference_quads(spark: SparkSession, path: str = REFERENCE_QUADS) -> DataFrame:
    """Read the reference's annotated assertion fixture (724 quads; empty
    gt_entity == must-eliminate, evaluate.py:46-59)."""
    with open(path, encoding="utf-8") as f:
        rows = [tuple(r) for r in csv.reader(f) if len(r) == 4]
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def synthetic_quads(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic DBP-Lit-shaped quads at arbitrary scale, generated
    distributively. ~25% get empty gt (must-eliminate), mirroring the
    reference fixture's 226/724 ratio; a few hot literals reproduce its
    skew (SURVEY.md §4: 'Baku', 'Paris' repeat)."""
    ns = "http://example.org/resource/"
    np_ = "http://example.org/property/"
    df = spark.range(n).withColumn(
        "h", F.abs(F.hash(F.concat(F.lit(f"quad{seed}|"), F.col("id"))))
    )
    hot = F.col("h") % 20 < 3  # ~15% of rows share 5 hot literals
    lit_id = F.when(hot, F.col("h") % 5).otherwise(F.col("id") + 100)
    gt_empty = F.col("h") % 4 == 0
    return df.select(
        F.concat(F.lit(ns), F.lit("Subj_"), F.col("id")).alias("subject"),
        F.concat(F.lit(np_), F.lit("prop"), (F.col("h") % 50)).alias("predicate"),
        F.concat(F.lit("entity "), lit_id).alias("literal"),
        F.when(gt_empty, F.lit("")).otherwise(
            F.concat(F.lit(ns), F.lit("Entity_"), lit_id)
        ).alias("gt_entity"),
    )


# ---------------------------------------------------------------------------
# Corpus: render quads into source-file content


def render_corpus(
    quads: DataFrame,
    files_per_repo: int = 20,
    noise_lines: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Quads -> repos(repo, path, commit, lang, content).

    Each quad becomes one ``KG:`` line inside a synthetic source file;
    multiple quads per file; deterministic noise lines around them. A few
    hot repos receive ~10x the files (hot-key skew per FIXTURES.md §1).
    Pure column expressions — scales to any quad count.
    """
    langs = F.array(*[F.lit(x) for x in ("py", "java", "go", "rs", "md")])
    noise = F.array(*[F.lit(w) for w in NOISE_WORDS])

    q = quads.withColumn(
        "qh", F.abs(F.hash(F.concat_ws("\x01", "subject", "predicate", "literal")))
    )
    # skew: hash-bucket 0..9 == hot repo 0 (collapses ~1/10 of files into it)
    bucket = F.col("qh") % 100
    repo_id = F.when(bucket < 10, F.lit(0)).otherwise(bucket)
    file_id = F.col("qh") % files_per_repo

    line = F.format_string('KG: <%s> <%s> "%s" .', "subject", "predicate", "literal")
    noise_pre = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), F.lit(noise_lines - 1)),
            lambda i: F.concat(
                F.element_at(noise, (F.col("qh") + i * 7) % F.lit(len(NOISE_WORDS)) + 1),
                F.lit(" x"),
                (F.col("qh") + i) % 997,
            ),
        ),
    )

    per_file = (
        q.withColumn("repo_id", repo_id)
        .withColumn("file_id", file_id)
        .withColumn("line", line)
        .withColumn("noise", noise_pre)
        .groupBy("repo_id", "file_id")
        .agg(
            F.concat_ws(
                "\n", F.sort_array(F.collect_list(F.concat_ws("\x02", "line", "noise")))
            ).alias("body")
        )
        .withColumn("body", F.regexp_replace("body", "\x02", "\n"))
    )
    return per_file.select(
        F.format_string("org/repo-%03d", "repo_id").alias("repo"),
        F.format_string("src/file_%04d.src", "file_id").alias("path"),
        F.sha2(F.format_string("%d|%d|%d", F.lit(seed), "repo_id", "file_id"), 256)
        .substr(1, 40)
        .alias("commit"),
        F.element_at(langs, (F.col("file_id") % 5 + 1).cast("int")).alias("lang"),
        F.col("body").alias("content"),
    )


# ---------------------------------------------------------------------------
# KB side tables (derived from quads, deterministic)


def build_kb(spark: SparkSession, quads: DataFrame, seed: int = 42) -> dict[str, DataFrame]:
    """Derive the KB side tables a real deployment would already have
    (label index, triples, classes, redirects), such that the pipeline's
    own machinery — lexical candidate gen, graph features, embedding
    scoring, constraints — can genuinely recover gt_entity for annotated
    quads and eliminate the empty-gt ones.

    Construction (all column exprs / small broadcast-size outputs):
      * every gt_entity gets label == literal (as DBpedia labels do), plus
        3 distractor entities per literal sharing a token prefix;
      * kb_triples: (subject, predicate, gt_entity) REMOVED (P5 mask
        semantics, predict.py:79-84); instead gt entities appear as objects
        of the same predicate with *other* subjects, giving the range/
        cardinality miners and graph features real signal;
      * entity_class / class_ancestor: gt entities of predicate p -> class
        Cp -> ancestor 'owl:Thing'; distractors get class 'Distractor'
        (disjoint), so range validation demotes them;
      * redirects: identity + a 'Redir_' alias per gt entity
        (util_kb.py:186-217 closure shape).
    """
    q = quads.cache()
    ann = q.filter(F.col("gt_entity") != "")

    lit_gt = ann.select("literal", F.col("gt_entity").alias("entity")).distinct()

    # label index: gt label == literal; distractors share the first token
    labels_gt = lit_gt.select("entity", F.col("literal").alias("label"))
    distract = (
        lit_gt.select("literal")
        .distinct()
        .withColumn("d", F.explode(F.sequence(F.lit(1), F.lit(3))))
        .select(
            F.concat(
                F.lit("http://example.org/resource/Distract_"),
                F.abs(F.hash("literal")) % 100000,
                F.lit("_"),
                "d",
            ).alias("entity"),
            F.concat(
                F.element_at(F.split(F.col("literal"), " "), 1),
                F.lit(" variant "),
                "d",
            ).alias("label"),
            F.col("literal").alias("src_literal"),
        )
    )
    entity_label = labels_gt.unionByName(
        distract.select("entity", "label")
    ).distinct()

    # kb triples: gt entity as object of p for 4 synthetic other subjects
    support = (
        ann.select("predicate", "gt_entity")
        .distinct()
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(4))))
        .select(
            F.concat(
                F.lit("http://example.org/resource/Other_"),
                F.abs(F.hash(F.concat_ws("|", "predicate", "gt_entity"))) % 100000,
                F.lit("_"),
                "i",
            ).alias("s"),
            F.col("predicate").alias("p"),
            F.col("gt_entity").alias("o"),
        )
    )
    # plus subject-context triples so LinkFeat/NodeFeat see the subjects
    subj_ctx = ann.select(
        F.col("subject").alias("s"),
        F.lit("http://example.org/property/related").alias("p"),
        F.col("gt_entity").alias("o"),
    )
    kb_triples = support.unionByName(subj_ctx).distinct()

    # classes: one class per predicate for gt objects; distractors disjoint
    ec_gt = ann.select(
        F.col("gt_entity").alias("entity"),
        F.concat(
            F.lit("http://example.org/ontology/Class_"),
            F.element_at(F.split("predicate", "/"), -1),
        ).alias("class"),
    ).distinct()
    ec_bad = distract.select(
        "entity", F.lit("http://example.org/ontology/Distractor").alias("class")
    )
    entity_class = ec_gt.unionByName(ec_bad).distinct()
    class_ancestor = (
        entity_class.select("class")
        .distinct()
        .select("class", F.lit("http://www.w3.org/2002/07/owl#Thing").alias("ancestor"))
    )

    # redirects: identity + alias
    ents = entity_label.select("entity").distinct()
    redirects = ents.select(
        "entity", F.col("entity").alias("equivalent")
    ).unionByName(
        lit_gt.select("entity").distinct().select(
            "entity",
            F.concat(F.lit("http://example.org/resource/Redir_"),
                     F.element_at(F.split("entity", "/"), -1)).alias("equivalent"),
        )
    )

    return {
        "entity_label": entity_label,
        "kb_triples": kb_triples,
        "entity_class": entity_class,
        "class_ancestor": class_ancestor,
        "redirects": redirects,
    }


def build_kge(quads_pd, dim: int = 16, seed: int = 42):
    """TransE-style vectors as a pandas DataFrame (id, kind, vec).

    Deterministic hash-seeded vectors; gt entities placed at s + r (+eps)
    so TransE scoring (predict_embedding.py:128-136 semantics) genuinely
    ranks them first. Driver-side because embedding *training* is a
    pluggable single-node step in the rebuild (SURVEY.md §2.8 M9); the
    engine consumes this as a broadcastable (id, vec) table.
    """
    import pandas as pd

    def vec(key: str) -> np.ndarray:
        h = hashlib.sha256(f"{seed}|{key}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        v = rng.standard_normal(dim)
        return v / max(np.linalg.norm(v), 1e-9)

    rows: dict[tuple[str, str], np.ndarray] = {}
    for r in quads_pd.itertuples(index=False):
        s, p, gt = r.subject, r.predicate, r.gt_entity
        rows.setdefault(("e", s), vec("e|" + s))
        rows.setdefault(("r", p), vec("r|" + p))
        if gt:
            rows[("e", gt)] = rows[("e", s)] + rows[("r", p)] + 0.01 * vec("n|" + gt)
    out = pd.DataFrame(
        [(k[1], k[0], v.astype("float32").tolist()) for k, v in sorted(rows.items(), key=lambda kv: kv[0])],
        columns=["id", "kind", "vec"],
    )
    return out


def build_kge_spark(quads: DataFrame, dim: int = 16, seed: int = 42) -> DataFrame:
    """Distributed version of build_kge: same contract (id, kind, vec),
    hash-seeded unit vectors computed in an Arrow pandas UDF, gt vectors
    placed at s + r (+ eps) via joins — no driver-side loop, scales with
    the quad count. Used by the scaling benchmark; tests use the pandas
    variant for tiny fixtures.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    @pandas_udf(ArrayType(FloatType()))
    def hash_vec(key: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = []
        for k in key:
            h = hashlib.sha256(f"{seed}|{k}".encode()).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
            v = rng.standard_normal(dim)
            out.append((v / max(np.linalg.norm(v), 1e-9)).astype("float32"))
        return pd.Series(out)

    subs = quads.select(F.col("subject").alias("id")).distinct().withColumn(
        "vec", hash_vec(F.concat(F.lit("e|"), F.col("id")))
    )
    rels = quads.select(F.col("predicate").alias("id")).distinct().withColumn(
        "vec", hash_vec(F.concat(F.lit("r|"), F.col("id")))
    )
    # gt entity vector = subject_vec + relation_vec + 0.01 * noise(gt)
    ann = quads.filter(F.col("gt_entity") != "").select(
        "subject", "predicate", "gt_entity"
    ).distinct()
    gt = (
        ann.join(subs.withColumnRenamed("id", "subject").withColumnRenamed("vec", "sv"), "subject")
        .join(rels.withColumnRenamed("id", "predicate").withColumnRenamed("vec", "rv"), "predicate")
        .withColumn("nv", hash_vec(F.concat(F.lit("n|"), F.col("gt_entity"))))
        .select(
            F.col("gt_entity").alias("id"),
            F.zip_with(
                F.zip_with("sv", "rv", lambda a, b: a + b),
                "nv",
                lambda ab, n: (ab + n * F.lit(0.01)).cast("float"),
            ).alias("vec"),
        )
        # a gt entity can be target of several (s,p): keep the lexicographic
        # min vector (arrays order element-wise) — deterministic
        .groupBy("id").agg(F.min("vec").alias("vec"))
    )
    # gt vectors take precedence over plain subject-hash vectors
    ents = subs.join(gt, "id", "left_anti").unionByName(gt)
    return ents.withColumn("kind", F.lit("e")).select("id", "kind", "vec").unionByName(
        rels.withColumn("kind", F.lit("r")).select("id", "kind", "vec")
    )
