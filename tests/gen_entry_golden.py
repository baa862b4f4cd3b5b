"""Regenerate the flagship entry() digest golden (tests/goldens/
entry_sf0001.json) after an INTENTIONAL change to the flagship pipeline's
output. See tests/test_entry_golden.py for what it pins."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_entry_golden import GOLDEN, entry_digest  # noqa: E402

if __name__ == "__main__":
    from convert_spark.session import get_session

    spark = get_session(cores=8, app_name="gen_entry_golden")
    digest = entry_digest(spark)
    GOLDEN.write_text(json.dumps(digest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {GOLDEN}: {digest['n_rows']} rows, sha {digest['sha256'][:16]}…")
