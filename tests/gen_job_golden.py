"""Regenerate the sf0.1 job-output golden (tests/goldens/
job_tile_json_sf01.json) after an INTENTIONAL change to the tile
pipeline's JSON output. See tests/test_job_golden.py for what it pins."""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_job_golden import GOLDEN, job_json_digest, run_job  # noqa: E402

if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as td:
        run_job(str(Path(td) / "job_out"))
        digest = job_json_digest(str(Path(td) / "job_out"))
    GOLDEN.write_text(json.dumps(digest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {GOLDEN}: {digest['n_rows']} rows")
