"""Byte-pinned digest golden for the FLAGSHIP driver entry
(``__spark_entry__.entry``) at its contract scale, sf0.001.

Round-6 VERDICT item 4: the flagship is measured (bench headline_walls)
and smoke-checked by the driver, but its CONTENT was not pinned the way
the sf0.1 job output is. This test freezes it: one canonical line per
output row (every column, floats via repr — exact), sha256-chained in
output order, plus the first rows verbatim. Any drift in extraction,
normalization, tiling, the per-tile dataset aggregate, the DEM surface,
the S2 covering or the PIP rollup flips the digest.

Regenerate after an INTENTIONAL output change:
    python tests/gen_entry_golden.py
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GOLDEN = Path(__file__).resolve().parent / "goldens" / "entry_sf0001.json"

if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _canon_cell(v) -> str:
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def entry_digest(spark) -> dict:
    import __spark_entry__ as e

    df = e.entry(spark)
    cols = df.columns
    rows = df.collect()  # entry() orders by cell_id; collect preserves it
    h = hashlib.sha256()
    lines = []
    for r in rows:
        line = "|".join(_canon_cell(r[c]) for c in cols)
        h.update(line.encode() + b"\n")
        lines.append(line)
    return {
        "n_rows": len(rows),
        "columns": cols,
        "sha256": h.hexdigest(),
        "head": lines[:3],
    }


def test_entry_matches_golden(spark):
    assert GOLDEN.exists(), "golden missing — run python tests/gen_entry_golden.py"
    got = entry_digest(spark)
    exp = json.loads(GOLDEN.read_text())
    assert got["n_rows"] == exp["n_rows"]
    assert got["columns"] == exp["columns"]
    assert got["head"] == exp["head"]
    assert got["sha256"] == exp["sha256"]
