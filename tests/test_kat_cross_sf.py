"""Cross-scale-factor twin verification for the KAT-backed queries.

The committed KAT parquets pin sf0.01 (the driver's gate). This sweep
re-derives each scalar twin at sf0.001, sf0.01 AND sf0.1 and asserts the
ENGINE (Spark) agrees at every scale — the same three-SF sweep the SQL
oracles already get, which caught the PIP zero-count-row gap in round 3.
A divergence that only appears at a different data scale (e.g. an
empty-input edge or a bucket-occupancy-dependent branch) shows up here
before it can hide behind the single pinned KAT.
"""

from __future__ import annotations

import pandas as pd
import pytest

import gen_kats
from convert_spark import queries as Q

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[d.rsplit("/", 1)[1] for d in SF_DIRS])
@pytest.mark.parametrize("name", gen_kats.KAT_QUERIES)
def test_twin_engine_agreement(spark, name: str, sf_dir: str) -> None:
    twin = gen_kats.KAT_BUILDERS[name](sf_dir)
    got = Q.QUERIES[name](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(twin), check_dtype=False)
