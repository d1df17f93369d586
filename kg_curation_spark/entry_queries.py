"""queries()/oracle_sql() registry — the driver's correctness gate.

One entry per implemented operator family from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis),
each expressed twice: as the engine's Spark implementation and as ANSI SQL
for the DuckDB oracle. Column names and float rounding match exactly on
both sides (driver hashes values after sorting columns by name).

Convention: every float column is rounded (r6/r4) on BOTH sides so
double-vs-float evaluation-order noise cannot flip the value hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .functions import text as T
from .operators.topk import topk_per_group

QUERIES: dict = {}
ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


# =========================================================================
# §2.2 Projections / filters / predicates
# =========================================================================

@q(
    "distinct_project",  # P1: cache.py:63/93 distinct-column projection
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_project(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "prefix_filter",  # P2: namespace startswith predicate (util_kb.py:86)
    "SELECT p_partkey, p_name, p_type FROM part "
    "WHERE p_type LIKE 'ECO%' AND p_name NOT LIKE 'small%'",
)
def prefix_filter(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").startswith("ECO") & ~F.col("p_name").startswith("small")
    ).select("p_partkey", "p_name", "p_type")


@q(
    "semi_join_membership",  # P4: membership semi-join (subKB.py:82-87)
    "SELECT p_partkey, p_name FROM part "
    "WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)",
)
def semi_join_membership(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


@q(
    "anti_join_mask",  # P5: GT-removal anti-join (predict.py:79-84)
    "SELECT c_custkey, c_name FROM customer "
    "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def anti_join_mask(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "uri_localname_project",  # P8: URI -> local-name (util_kb.py:69-78)
    "SELECT DISTINCT "
    "  regexp_extract(url, '([^/#]*)$', 1) AS localname, "
    "  lower(replace(regexp_extract(url, '([^/#]*)$', 1), '_', ' ')) AS label "
    "FROM (SELECT 'http://ex.org/resource/' || replace(p_name, ' ', '_') AS url FROM part)",
)
def uri_localname_project(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select(
        F.concat(
            F.lit("http://ex.org/resource/"), F.regexp_replace("p_name", " ", "_")
        ).alias("url")
    )
    return p.select(
        T.uri_localname("url").alias("localname"),
        F.lower(F.regexp_replace(T.uri_localname("url"), "_", " ")).alias("label"),
    ).distinct()


@q(
    "lexical_match",  # P9: literal<->localname equality (evaluate.py:143-147)
    "SELECT d.doc_id, d.source FROM documents d "
    "WHERE lower(trim(d.source)) = lower(replace('src_' || (d.doc_id % 20), '_', ' ')) "
    "   OR lower(trim(d.source)) = lower(replace('src' || (d.doc_id % 20), '_', ' '))",
)
def lexical_match(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    uri1 = F.concat(F.lit("http://x/src_"), F.col("doc_id") % 20)
    uri2 = F.concat(F.lit("http://x/src"), F.col("doc_id") % 20)
    return d.filter(
        T.lexical_match(F.col("source"), uri1) | T.lexical_match(F.col("source"), uri2)
    ).select("doc_id", "source")


# =========================================================================
# §2.5 Window / top-k
# =========================================================================

@q(
    "topk_per_group",  # W1: top-k by score per triple (predict.py:200-203)
    "SELECT l_orderkey, l_linenumber, l_extendedprice, rank FROM ("
    "  SELECT l_orderkey, l_linenumber, l_extendedprice, "
    "         row_number() OVER (PARTITION BY l_orderkey "
    "             ORDER BY l_extendedprice DESC, l_linenumber) AS rank "
    "  FROM lineitem) WHERE rank <= 2",
)
def topk_query(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return topk_per_group(
        li, ["l_orderkey"], [F.desc("l_extendedprice"), F.asc("l_linenumber")], 2
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "rank")


@q(
    "dictionary_encode",  # S10: dense-id assignment (predict_embedding.py:43-83)
    "SELECT o_orderpriority, "
    "       row_number() OVER (ORDER BY o_orderpriority) - 1 AS id "
    "FROM (SELECT DISTINCT o_orderpriority FROM orders)",
)
def dictionary_encode(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    w = Window.orderBy("o_orderpriority")
    return o.select(
        "o_orderpriority", (F.row_number().over(w) - 1).alias("id")
    )


# =========================================================================
# §2.4 Aggregations
# =========================================================================

@q(
    "cardinality_histogram",  # A2: constraint_mining.py:41-69
    "WITH per_subj AS ("
    "  SELECT o_orderpriority AS p, o_custkey AS s, count(*) AS n "
    "  FROM orders GROUP BY 1, 2) "
    "SELECT p, n, round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY p), 6) AS rate, "
    "       max(max(n)) OVER (PARTITION BY p) AS max_n "
    "FROM per_subj GROUP BY p, n",
)
def cardinality_histogram(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    per_subj = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("s")
    ).agg(F.count(F.lit(1)).alias("n"))
    dist = per_subj.groupBy("p", "n").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("p")
    return dist.select(
        "p",
        "n",
        F.round(F.col("freq") / F.sum("freq").over(w), 6).alias("rate"),
        F.max("n").over(w).alias("max_n"),
    )


@q(
    "range_histogram",  # A3: per-key class-rate distribution (constraint_mining.py:71-119)
    "WITH oc AS (SELECT DISTINCT l_returnflag AS p, l_partkey AS e FROM lineitem), "
    "cls AS (SELECT oc.p, oc.e, pt.p_type AS class FROM oc "
    "        JOIN part pt ON pt.p_partkey = oc.e) "
    "SELECT p, class, round(count(DISTINCT e) * 1.0 / "
    "       max(tot), 6) AS rate FROM ("
    "  SELECT p, class, e, count(DISTINCT e) OVER (PARTITION BY p) AS tot FROM cls) "
    "GROUP BY p, class",
)
def range_histogram(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    oc = (
        li.select(F.col("l_returnflag").alias("p"), F.col("l_partkey").alias("e"))
        .distinct()
        .join(part.select(F.col("p_partkey").alias("e"), F.col("p_type").alias("class")), "e")
    )
    totals = oc.groupBy("p").agg(F.countDistinct("e").alias("tot"))
    counts = oc.groupBy("p", "class").agg(F.countDistinct("e").alias("cnt"))
    return counts.join(totals, "p").select(
        "p", "class", F.round(F.col("cnt") / F.col("tot"), 6).alias("rate")
    )


@q(
    "noisy_or",  # A4: 1 - prod(1-p) (validate_constraint.py:136-152)
    "SELECT l_orderkey, round(1.0 - exp(sum(ln(1.0 - l_discount))) + 1e-9, 6) AS noisy_or "
    "FROM lineitem GROUP BY l_orderkey",
)
def noisy_or_query(spark, sf_dir):
    from .functions.scoring import noisy_or

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.round(noisy_or(F.col("l_discount")) + 1e-9, 6).alias("noisy_or")
    )


@q(
    "score_merge",  # J8: join two score tables, missing -> 0, mean
    "WITH s1 AS (SELECT l_partkey AS k, round(avg(l_discount) + 1e-9, 6) AS sc1 "
    "            FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1), "
    "     s2 AS (SELECT l_partkey AS k, round(avg(l_tax) + 1e-9, 6) AS sc2 "
    "            FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1) "
    "SELECT coalesce(s1.k, s2.k) AS k, "
    "       round((coalesce(sc1, 0) + coalesce(sc2, 0)) / 2 + 1e-9, 6) AS merged "
    "FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k",
)
def score_merge(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s1 = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.round(F.avg("l_discount") + 1e-9, 6).alias("sc1"))
    )
    s2 = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.round(F.avg("l_tax") + 1e-9, 6).alias("sc2"))
    )
    return s1.join(s2, "k", "full_outer").select(
        "k",
        F.round(
            (F.coalesce("sc1", F.lit(0.0)) + F.coalesce("sc2", F.lit(0.0))) / 2 + 1e-9, 6
        ).alias("merged"),
    )


@q(
    "minmax_normalize",  # A13: global min/max normalization (evaluate.py:118-126)
    "SELECT o_orderkey, round((o_totalprice - min(o_totalprice) OVER ()) / "
    "       (max(o_totalprice) OVER () - min(o_totalprice) OVER ()), 6) AS norm "
    "FROM orders",
)
def minmax_normalize(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        F.round((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6).alias("norm"),
    )


@q(
    "union_distinct",  # U1/A1: entity-pool union (subKB.py:30-38)
    "SELECT o_custkey AS key FROM orders UNION "
    "SELECT c_custkey FROM customer UNION "
    "SELECT s_suppkey FROM supplier",
)
def union_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"))
    return o.unionByName(c).unionByName(s).distinct()


@q(
    "dedup_keep_min_rank",  # U4: ordered dedup (util_kb.py:31-35)
    "SELECT l_orderkey, l_partkey, min(l_linenumber) AS first_seen "
    "FROM lineitem GROUP BY l_orderkey, l_partkey",
)
def dedup_keep_min_rank(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey", "l_partkey").agg(
        F.min("l_linenumber").alias("first_seen")
    )


@q(
    "group_collect_sorted",  # A14: group-collect (constraint_mining.py:32-38)
    "SELECT o_orderpriority, string_agg(DISTINCT o_orderstatus, ';' ORDER BY o_orderstatus) AS statuses "
    "FROM orders GROUP BY o_orderpriority",
)
def group_collect_sorted(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderstatus")), ";"
        ).alias("statuses")
    )


# =========================================================================
# §2 evaluation aggregates (A10-A12) — rank metrics over a deterministic
# candidate table derived from the testdata: for each order, "GT" is the
# supplier on its min-linenumber lineitem; candidates are its lineitems'
# suppliers ranked by (extendedprice desc, linenumber asc).
# =========================================================================

_CAND_SQL = (
    "WITH cand AS ("
    "  SELECT l_orderkey AS okey, l_suppkey AS supp, "
    "         row_number() OVER (PARTITION BY l_orderkey "
    "             ORDER BY l_extendedprice DESC, l_linenumber) AS rank "
    "  FROM lineitem), "
    "gt AS ("
    "  SELECT l_orderkey AS okey, "
    "         min_by(l_suppkey, l_linenumber * 1000000 + l_suppkey) AS gt_supp "
    "  FROM lineitem GROUP BY 1), "
    "best AS ("
    "  SELECT gt.okey, min(cand.rank) AS best_rank "
    "  FROM gt LEFT JOIN cand ON cand.okey = gt.okey AND cand.supp = gt.gt_supp "
    "  GROUP BY gt.okey) "
)


def _candidates(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cand = topk_per_group(
        li, ["l_orderkey"], [F.desc("l_extendedprice"), F.asc("l_linenumber")],
        k=10**9,
    ).select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("supp"), "rank"
    )
    gt = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.min_by("l_suppkey", F.col("l_linenumber") * 1000000 + F.col("l_suppkey")).alias("gt_supp")
    )
    best = (
        gt.join(
            cand,
            (gt.okey == cand.okey) & (cand.supp == gt.gt_supp),
            "left",
        )
        .groupBy(gt.okey)
        .agg(F.min("rank").alias("best_rank"))
    )
    return best


@q(
    "hits_at_k_mrr",  # A10: evaluate.py:70-113
    _CAND_SQL
    + "SELECT round(avg(CASE WHEN best_rank = 1 THEN 1.0 ELSE 0.0 END), 6) AS hits1, "
    "       round(avg(CASE WHEN best_rank <= 5 THEN 1.0 ELSE 0.0 END), 6) AS hits5, "
    "       round(avg(coalesce(1.0 / best_rank, 0.0)), 6) AS mrr "
    "FROM best",
)
def hits_at_k_mrr(spark, sf_dir):
    best = _candidates(spark, sf_dir)
    return best.agg(
        F.round(F.avg(F.when(F.col("best_rank") == 1, 1.0).otherwise(0.0)), 6).alias("hits1"),
        F.round(F.avg(F.when(F.col("best_rank") <= 5, 1.0).otherwise(0.0)), 6).alias("hits5"),
        F.round(F.avg(F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0))), 6).alias("mrr"),
    )


@q(
    "recall_at_k",  # A12: evaluate_REE.py:33-51 — one pass, k-grid join
    _CAND_SQL
    + "SELECT k, round(avg(CASE WHEN best_rank <= k THEN 1.0 ELSE 0.0 END), 6) AS recall "
    "FROM best CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS k) "
    "GROUP BY k",
)
def recall_at_k_query(spark, sf_dir):
    best = _candidates(spark, sf_dir)
    grid = spark.range(1, 6).select(F.col("id").alias("k"))
    return (
        best.crossJoin(F.broadcast(grid))
        .groupBy("k")
        .agg(
            F.round(
                F.avg(F.when(F.col("best_rank") <= F.col("k"), 1.0).otherwise(0.0)), 6
            ).alias("recall")
        )
    )


@q(
    "threshold_sweep",  # A11: evaluate.py:116-183 — grid cross-join, one pass
    "WITH scored AS ("
    "  SELECT (o_totalprice - min(o_totalprice) OVER ()) / "
    "         (max(o_totalprice) OVER () - min(o_totalprice) OVER ()) AS score, "
    "         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label "
    "  FROM orders) "
    "SELECT round(t * 0.05, 2) AS theta, "
    "       round(avg(CASE WHEN (score >= t * 0.05) = (label = 1) THEN 1.0 ELSE 0.0 END), 6) AS accuracy "
    "FROM scored CROSS JOIN (SELECT unnest(generate_series(0, 20)) AS t) "
    "GROUP BY t",
)
def threshold_sweep_query(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    stats = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    scored = o.crossJoin(F.broadcast(stats)).select(
        ((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    grid = spark.range(0, 21).select(F.col("id").alias("t"))
    return (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("t")
        .agg(
            F.round(
                F.avg(
                    F.when(
                        (F.col("score") >= F.col("t") * 0.05) == (F.col("label") == 1),
                        1.0,
                    ).otherwise(0.0)
                ),
                6,
            ).alias("accuracy")
        )
        .select(F.round(F.col("t") * 0.05, 2).alias("theta"), "accuracy")
    )
