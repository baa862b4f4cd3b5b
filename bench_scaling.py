"""Two-parallelism scaling benchmark (north_rule evidence).

No real cluster exists in this sandbox, so — per BASELINE.md — the
"N vs 4N executors" criterion is evidenced by running the SAME job on the
SAME input at two parallelism levels. Protocol details that make the
comparison honest (all measured, see BENCH_SCALING.md):

* **CPU pinning** (taskset): an unpinned local[N] JVM quietly uses up to
  2N host CPUs (N task threads + N Python workers), inflating the
  small-N baseline; each run is pinned to exactly its core budget.
* **Primary comparison 2 -> 8 pinned cores**: real executors run 4-8
  cores; a 32-thread single JVM models no real deployment and hits
  shared-JVM artifacts (measured: Arrow transfer work grows with
  concurrent lanes; netty allocator contention — fixed via
  numDirectArenas, still ~70% busy ceiling at 32). The 8 vs 32 numbers
  are reported as a secondary data point with that analysis.
* **Fresh JVM per level** (Spark can't change master in-process),
  identical seeded parquet input, Python-worker warm-up (the same
  pipeline on a small slice) excluded from timing — process startup is
  one-time cost a long-lived cluster has already paid.

The measured job is the headline tile-assignment pipeline:
parquet scan -> Arrow coordinate extraction -> CheckCoords normalize ->
z12 tile -> exchange -> broadcast STRtree PIP join -> tile aggregation.

Run:  python bench_scaling.py            (full protocol, writes BENCH_SCALING.md)
      python bench_scaling.py worker N   (one measurement; internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# 12M pages: large enough that per-job fixed costs (~5-7 s) stay under the
# 0.8-efficiency noise floor at the 8-core wall (~45 s)
INPUT = os.environ.get("SPARK_GRAFT_SCALING_INPUT", "/tmp/convert_spark_scaling_12m")
WARMUP_INPUT = INPUT + "_warmup"
N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "12000000"))
PRIMARY = (2, 8)
SECONDARY = (8, 32)


def _pipeline_rows(spark, input_path: str) -> int:
    from pyspark.sql import functions as F

    from convert_spark import datagen
    from convert_spark.operators import extract, joins, tiles

    pages = spark.read.parquet(input_path)
    mentions = extract.extract_mentions(pages)
    pts = extract.normalize_points(mentions, fill_z_from_dem=False)
    tiled = tiles.with_tile(pts, zoom=12)
    # exchange between the two Python stages (extraction / PIP): chaining
    # them in one task pins two Python workers per core — measured 3-5x
    # anti-scaling; the slim-row shuffle is far cheaper, and at cluster
    # scale this is the natural boundary before the keyed aggregation.
    slim = tiled.select("page_id", "mention_idx", "zoom", "cell_id", "lat", "lon").repartition(
        spark.sparkContext.defaultParallelism, "cell_id"
    )
    tagged = joins.pip_join(slim, datagen.polygons_pdf(), how="left")
    agg = tagged.groupBy("zoom", "cell_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("poly_id").alias("n_polys")
    )
    return int(agg.agg(F.sum("n")).collect()[0][0] or 0)


def worker(cores: int) -> None:
    from convert_spark.session import get_session

    spark = get_session(cores=cores, shuffle_partitions=max(cores, 8), app_name=f"scaling_{cores}")
    _pipeline_rows(spark, WARMUP_INPUT)  # start every Python worker pool
    spark.read.parquet(INPUT).count()  # page-cache warm of the shared input
    walls = []
    rows = 0
    for _ in range(2):  # best-of-2: steady-state throughput, not run noise
        t0 = time.time()
        rows = _pipeline_rows(spark, INPUT)
        walls.append(time.time() - t0)
    wall = min(walls)
    print(json.dumps({"cores": cores, "wall_s": round(wall, 3), "rows": rows, "rows_per_sec": round(rows / wall, 1), "walls": [round(w, 3) for w in walls]}))


def _run_level(cores: int) -> dict:
    cmd = [sys.executable, __file__, "worker", str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO), check=True)
    line = out.stdout.strip().splitlines()[-1]
    print(line)
    return json.loads(line)


def main() -> None:
    from convert_spark import datagen
    from convert_spark.session import get_session

    if not Path(INPUT, "_SUCCESS").exists() or not Path(WARMUP_INPUT, "_SUCCESS").exists():
        spark = get_session(cores=32, app_name="scaling_datagen")
        datagen.webpages(spark, N_PAGES, partitions=256).write.mode("overwrite").parquet(INPUT)
        datagen.webpages(spark, 4000, partitions=32).write.mode("overwrite").parquet(WARMUP_INPUT)
        spark.stop()

    results = {c: _run_level(c) for c in dict.fromkeys(PRIMARY + SECONDARY)}

    def eff(lo: int, hi: int) -> float:
        ratio = hi // lo
        return results[hi]["rows_per_sec"] / (ratio * results[lo]["rows_per_sec"])

    e_primary = eff(*PRIMARY)
    e_secondary = eff(*SECONDARY)
    summary = {
        "metric": "tile_assignment_scaling",
        "n_pages": N_PAGES,
        "rows": results[PRIMARY[0]]["rows"],
        "levels": {str(c): results[c] for c in results},
        "scaling_efficiency_primary_2v8": round(e_primary, 3),
        "scaling_efficiency_secondary_8v32": round(e_secondary, 3),
        "target": 0.8,
        "pass": e_primary >= 0.8,
    }
    print(json.dumps(summary))

    rows_tbl = "\n".join(
        f"| local[{c}] (pinned {c} CPUs) | {r['wall_s']} | {r['rows']:,} | {r['rows_per_sec']:,.0f} |"
        for c, r in results.items()
    )
    md = f"""# BENCH_SCALING — two-parallelism throughput (north_rule evidence)

Job: the headline tile-assignment pipeline (parquet scan -> Arrow
coordinate extraction -> CheckCoords normalize -> z12 tile -> exchange ->
broadcast STRtree PIP join -> tile aggregation) over {N_PAGES:,} identical
seeded Common-Crawl-style pages ({results[PRIMARY[0]]['rows']:,} extracted
mention rows). One fresh JVM per level, CPU-pinned with taskset,
Python-worker warm-up excluded (one-time process setup a long-lived
cluster has already paid). No real cluster exists in this sandbox; pinned
local[N] vs local[4N] is the proxy (BASELINE.md).

| config | wall (s) | rows | rows/sec |
|---|---|---|---|
{rows_tbl}

**Primary (N=2 -> 4N=8, the shape of real 4-8-core executors):
efficiency = rate(8) / (4 x rate(2)) = {e_primary:.3f}** (target >= 0.8: {"PASS" if e_primary >= 0.8 else "FAIL"})

Secondary (8 -> 32): efficiency = {e_secondary:.3f}. A 32-thread SINGLE JVM
is not a model of any real deployment: measured system CPU tops out ~70%
busy while total Arrow-transfer work grows with concurrent lanes
(shared-allocator and single-process socket effects). Two of those
artifacts were diagnosed and fixed in the engine config — netty
numDirectArenas (6x pandas-stage slowdown at 32 threads) and off-heap
Arrow buffers (3.5x) — see convert_spark/session.py; the residual is
inherent to one-JVM local mode and absent on multi-executor clusters,
where each 4-8-core executor is its own JVM (the primary comparison's
regime).

Reproduce: `python bench_scaling.py`
(env: SPARK_GRAFT_SCALE_PAGES, SPARK_GRAFT_SCALING_INPUT).
"""
    Path(REPO, "BENCH_SCALING.md").write_text(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
