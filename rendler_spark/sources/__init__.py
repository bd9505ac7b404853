"""Table IO: Iceberg-shaped warehouse over Parquet with JSON snapshot
manifests (no Iceberg runtime jar in this sandbox — SURVEY.md §0.4)."""
