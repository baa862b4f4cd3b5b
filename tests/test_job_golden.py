"""sf0.1-scale golden for the FULL job entry (jobs/tile_pipeline_job.py).

Round-5 (VERDICT item 8): the spark-submit test asserts the job runs,
resumes and keeps its bucketed rollup Exchange-free; this test pins the
CONTENT — the per-tile MineAR-style Datasets JSON the job emits
(tile_json stage) at the sf0.1 synthetic size (200k pages), byte-diffed
against a committed digest golden:

* row count,
* sha256 of every canonical row line, bucketed by cell_id % 16 (so a
  divergence localizes),
* the first rows verbatim (so a mismatch shows real content, not just
  hashes).

The job runs as a subprocess through its real __main__ entry on
local[*] (the spark-submit/local-cluster transport is covered by
TestSparkSubmit). Regenerate after an intentional output change:
    python tests/gen_job_golden.py
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GOLDEN = Path(__file__).resolve().parent / "goldens" / "job_tile_json_sf01.json"
N_PAGES = 200_000  # == datagen.n_pages_for_sf('/root/testdata/sf0.1')
ZOOM = 12


def run_job(out_dir: str, n_pages: int = N_PAGES) -> None:
    cmd = [
        sys.executable,
        str(REPO / "jobs" / "tile_pipeline_job.py"),
        "--n-pages", str(n_pages),
        "--zoom", str(ZOOM),
        "--output", out_dir,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])


def job_json_digest(out_dir: str) -> dict:
    """Canonical digest of the tile_json stage output (plain parquet —
    read with DuckDB, no Spark session needed)."""
    import duckdb

    rows = duckdb.sql(
        f"select zoom, cell_id, n_points, dataset_json "
        f"from '{out_dir}/tile_json/**/*.parquet' order by zoom, cell_id"
    ).fetchall()
    buckets: dict[str, "hashlib._Hash"] = {}
    for zoom, cell_id, n_points, doc in rows:
        line = f"{zoom}|{cell_id}|{n_points}|{doc}\n".encode()
        b = str(int(cell_id) % 16)
        buckets.setdefault(b, hashlib.sha256()).update(line)
    return {
        "n_rows": len(rows),
        "bucket_sha": {b: h.hexdigest() for b, h in sorted(buckets.items(), key=lambda kv: int(kv[0]))},
        "head": [
            {"zoom": int(z), "cell_id": int(c), "n_points": int(n), "dataset_json": d}
            for z, c, n, d in rows[:3]
        ],
    }


def test_job_tile_json_matches_golden(tmp_path):
    assert GOLDEN.exists(), "golden missing — run python tests/gen_job_golden.py"
    run_job(str(tmp_path / "job_out"))
    got = job_json_digest(str(tmp_path / "job_out"))
    exp = json.loads(GOLDEN.read_text())
    assert got["n_rows"] == exp["n_rows"]
    assert got["head"] == exp["head"]
    assert got["bucket_sha"] == exp["bucket_sha"]
