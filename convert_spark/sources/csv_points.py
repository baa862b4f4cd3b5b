"""CSV point-dataset source (S1 + P1/P2/F1, convert.go:168-229, 549-591).

Semantics preserved:

* header row binds roles: user-supplied xField/yField/zField names map to
  X/Y/Z; every other column becomes a (stringly) attribute
  (convert.go:190-204),
* **column-encounter-order quirk** (SURVEY.md §7.1.8): X/Y/Z values are
  appended in the order their columns appear in the header
  (convert.go:554-564) — a CSV with the Y column before X silently swaps
  axes; we preserve this faithfully,
* unparseable/empty coordinate strings become 0.0, not NULL
  (convert.go:557-564) — rows are NEVER dropped for bad values; arity is
  the number of coordinate COLUMNS bound in the header (Go csv records are
  rectangular), so CheckCoords can only reject when fewer than 2 of
  x/y/z-field names match the header (convert.go:1206-1210).

Scale note: spark.read.csv is a distributed scan; the role mapping is a
driver-side header inspection (one small file read) + a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import parse_double_go


def features_from_csv(
    spark: SparkSession,
    path_or_df,
    x_field: str,
    y_field: str,
    z_field: str = "",
    dataset_id: str = "csv",
) -> DataFrame:
    """Read a CSV (path or pre-read string DataFrame) into point features.

    Returns columns: dataset_id, feature_idx, xyz_raw (array<double> in
    column-encounter order), attributes map, had_z.
    """
    if isinstance(path_or_df, str):
        df = spark.read.csv(path_or_df, header=True, inferSchema=False)
    else:
        df = path_or_df
    header = df.columns
    roles = {}
    for col in header:
        if col == x_field:
            roles[col] = "x"
        elif col == y_field:
            roles[col] = "y"
        elif z_field and col == z_field:
            roles[col] = "z"
    coord_cols = [c for c in header if c in roles]  # encounter order (quirk)
    attr_cols = [c for c in header if c not in roles]

    if len(coord_cols) < 2:
        raise ValueError(
            f"CheckCoords: fewer than 2 coordinate columns bound "
            f"(x={x_field!r}, y={y_field!r}, z={z_field!r} vs header {header})"
        )
    # contiguous deterministic ids in FILE order: raw monotonically_
    # increasing_id values are sparse partition-encoded and change with the
    # split layout; row_number over them is contiguous 0..n-1 in byte order
    # of the file (CSV datasets are file-sized — the global window is fine
    # here, unlike on the web-scale tables)
    from pyspark.sql.window import Window

    out = (
        df.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("feature_idx", F.row_number().over(Window.orderBy("__mid")) - 1)
        .drop("__mid")
        .withColumn("dataset_id", F.lit(dataset_id))
    )
    # xyz in encounter order; parse failures/empties -> 0.0
    xyz = F.array(*[parse_double_go(c) for c in coord_cols])
    # Spark CSV reads empty fields as NULL; Go encoding/csv yields "" and
    # the reference stores it verbatim (convert.go:566-570) — coalesce back
    attrs = (
        F.create_map(*[x for c in attr_cols for x in (F.lit(c), F.coalesce(F.col(c), F.lit("")))])
        if attr_cols
        else F.create_map()
    )
    return (
        out.withColumn("xyz_raw", xyz)
        .withColumn("had_z", F.lit(len(coord_cols) >= 3))
        .withColumn("attributes", attrs)
        # header encounter order — the reference emits CSV attributes in
        # column order (convert.go:566-570), carried for downstream JSON
        .withColumn("attr_keys", F.array(*[F.lit(c) for c in attr_cols]))
        .select("dataset_id", "feature_idx", "xyz_raw", "had_z", "attributes", "attr_keys")
    )


def features_from_csv_dir(
    spark: SparkSession,
    path: str,
    x_field: str,
    y_field: str,
    z_field: str = "",
    glob: str = "*.csv",
) -> DataFrame:
    """Directory of point CSVs -> features, one DATASET PER FILE (the
    reference's one-file-one-dataset model, S1 x the S8 corpus shape).

    Same semantics as :func:`features_from_csv` (role binding P1,
    errors->0.0 P2, column-encounter-order quirk), with dataset_id from
    the file stem and feature_idx numbered in FILE order per dataset.
    The corpus must be header-homogeneous: spark.read.csv binds one
    schema from the first file and maps the rest by position, so mixed
    headers would silently misbind roles (one scan per header family is
    the contract, matching how a crawl partitions by schema).

    Scale shape: a distributed JVM CSV scan; the only window is
    PARTITIONED BY file (datasets are file-sized), so feature numbering
    never funnels the corpus through a global sort.
    """
    from pyspark.sql.window import Window

    df = (
        spark.read.option("pathGlobFilter", glob)
        .csv(path, header=True, inferSchema=False)
        .withColumn("__file", F.input_file_name())
    )
    header = [c for c in df.columns if c != "__file"]
    roles = {}
    for col in header:
        if col == x_field:
            roles[col] = "x"
        elif col == y_field:
            roles[col] = "y"
        elif z_field and col == z_field:
            roles[col] = "z"
    coord_cols = [c for c in header if c in roles]  # encounter order (quirk)
    attr_cols = [c for c in header if c not in roles]
    if len(coord_cols) < 2:
        raise ValueError(
            f"CheckCoords: fewer than 2 coordinate columns bound "
            f"(x={x_field!r}, y={y_field!r}, z={z_field!r} vs header {header})"
        )
    out = (
        df.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn(
            "feature_idx",
            F.row_number().over(Window.partitionBy("__file").orderBy("__mid")) - 1,
        )
        .withColumn(
            "dataset_id", F.regexp_extract(F.col("__file"), r"([^/]+?)(\.[^./]*)?$", 1)
        )
    )
    xyz = F.array(*[parse_double_go(c) for c in coord_cols])
    attrs = (
        F.create_map(*[x for c in attr_cols for x in (F.lit(c), F.coalesce(F.col(c), F.lit("")))])
        if attr_cols
        else F.create_map()
    )
    return (
        out.withColumn("xyz_raw", xyz)
        .withColumn("had_z", F.lit(len(coord_cols) >= 3))
        .withColumn("attributes", attrs)
        .withColumn("attr_keys", F.array(*[F.lit(c) for c in attr_cols]))
        .select("dataset_id", "feature_idx", "xyz_raw", "had_z", "attributes", "attr_keys")
    )
