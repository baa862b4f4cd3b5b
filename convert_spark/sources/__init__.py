"""Sources: format readers producing the engine's columnar feature model.

Reference scans S1-S4 (convert.go:168-546) re-expressed as Spark stages:
each reader turns (dataset_id, raw document/rows) into the long `features`
DataFrame (SURVEY.md §1.3) with flattened vertex arrays + offsets — the
shuffle-friendly encoding the normalization/mesh kernels consume.
"""

FEATURES_SCHEMA = (
    "dataset_id string, feature_idx long, geom_kind string, "
    "name string, style_type string, feature_id string, "
    "attributes map<string,string>, attr_keys array<string>, "
    "verts array<array<double>>, ring_offsets array<int>, part_offsets array<int>, "
    "had_z boolean"
)
