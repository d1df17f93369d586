"""Per-query isolation bench (guide §1.4): times each named query with a
noop sink (computes every column, no sink cost) and dumps
.explain('formatted') to plans/r07/<name>_<tag>.txt.

This file is NOT the driver's frozen bench.py — it exists so optimization
work can be measured without touching the frozen harness.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--tag before] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPEATS = int(os.environ.get("KG_BENCH_REPEATS", "3"))


def main() -> None:
    args = sys.argv[1:]
    tag = "probe"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kg_curation_spark.session import get_spark

    spark = get_spark(app_name="kgcs-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    import __spark_entry__ as e

    qs = e.queries()
    names = args or B.HEADLINE
    os.makedirs("plans/r07", exist_ok=True)
    out: dict[str, float] = {}
    for name in names:
        fn = B.BENCH_OVERRIDES.get(name) or qs[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        samples = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(min(samples), 3)
        print(f"# {name}: min {out[name]}s  all={[round(s,2) for s in samples]}",
              file=sys.stderr)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
