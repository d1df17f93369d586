"""Per-stage timing of the bench's kg_pipeline leg (guide §1): mirrors
bench.py's corpus synthesis + run_pipeline call exactly, then prints each
stage's wall from the checkpoint markers so the 20-25 s leg can be
attributed operator by operator.

Usage: SPARK_GRAFT_CPUS=32 python tools/pipeline_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KG_QUADS = int(os.environ.get("KG_BENCH_QUADS", "20000"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from kg_curation_spark import synth
    from kg_curation_spark.session import get_spark
    from kg_curation_spark.stages.pipeline import run_pipeline

    spark = get_spark(app_name="kgcs-pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")

    quads = synth.synthetic_quads(spark, KG_QUADS)
    corpus = synth.render_corpus(quads, files_per_repo=200)
    corpus_path = tempfile.mkdtemp(prefix="kgprobe_corpus_")
    corpus.write.mode("overwrite").parquet(corpus_path)
    repos = spark.read.parquet(corpus_path)
    kb = {n: df.cache() for n, df in synth.build_kb(spark, quads).items()}
    kge = synth.build_kge_spark(quads).cache()
    for df in (*kb.values(), kge):
        df.count()
    n_evec = kge.where("kind = 'e'").count()

    for rep in range(reps):
        wd = tempfile.mkdtemp(prefix="kgprobe_wd_")
        t0 = time.time()
        ctx = run_pipeline(
            spark, repos, kb, kge, wd, num_partitions=64, kge_entity_rows=n_evec
        )
        wall = time.time() - t0
        stages = {r.name: round(r.wall_s, 3) for r in ctx.ran}
        print(json.dumps({"rep": rep, "wall_s": round(wall, 3), "stages": stages,
                          "sum_stages": round(sum(stages.values()), 3)}))
        shutil.rmtree(wd, ignore_errors=True)
    shutil.rmtree(corpus_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
