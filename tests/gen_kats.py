"""Regenerate the known-answer tables (KATs) that back the oracle entries
for the queries whose math is not expressible in ANSI SQL (S2 cell-id bit
math, universal-hash minhash, FNV simhash, blake2b fingerprints).

The driver's correctness gate runs each oracle_sql() string on a plain
DuckDB connection — Python UDFs cannot be registered there — so these four
oracles SELECT from committed parquet KATs instead. The KATs are pinned
from this engine's own output at sf0.01 (self-referential at the pipeline
level, like the converter goldens); the underlying kernels carry
independent unit tests (FNV test vectors, S2 KATs + property tests,
minhash banding math) in tests/test_kernels_*.py.

Run after any intentional kernel change:  python tests/gen_kats.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

KAT_DIR = Path(__file__).resolve().parent / "kats"
KAT_QUERIES = ["q_s2_covering", "q_minhash_lsh", "q_simhash", "q_fingerprint", "q_ann_lsh", "q_ann_ivf"]
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from convert_spark import queries as Q
    from convert_spark.session import get_session

    spark = get_session(cores=8, shuffle_partitions=8, app_name="gen_kats")
    KAT_DIR.mkdir(exist_ok=True)
    for name in KAT_QUERIES:
        pdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
        pdf = pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)
        out = KAT_DIR / f"{name}.parquet"
        pdf.to_parquet(out, index=False)
        print(f"{name}: {len(pdf)} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
