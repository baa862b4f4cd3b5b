"""Plan layer: resumable snapshot/commit log (Iceberg-style, from scratch)."""
