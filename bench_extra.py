"""Round-8 optimization harness (bench.py is frozen for measurement).

Times a chosen subset of Q.QUERIES with the noop sink (guide §1.4), one
JSON line per run. Optionally dumps .explain("formatted") per query to
plans/r08/<name>_<tag>.txt.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [--plans TAG] [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "1"))


def main() -> None:
    from convert_spark import queries as Q
    from convert_spark.session import get_session

    args = sys.argv[1:]
    plans_tag = None
    if args and args[0] == "--plans":
        plans_tag = args[1]
        args = args[2:]
    names = args or list(Q.QUERIES)

    spark = get_session(cores=CPUS, app_name="bench_extra")
    spark.range(10).count()  # warm JVM

    out: dict[str, float] = {}
    for name in names:
        fn = Q.QUERIES[name]
        walls = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = min(walls)
        if plans_tag:
            pdir = Path(_REPO) / "plans" / "r08"
            pdir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (pdir / f"{name}_{plans_tag}.txt").write_text(plan)
        print(json.dumps({name: walls}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "queries": out}), flush=True)


if __name__ == "__main__":
    main()
