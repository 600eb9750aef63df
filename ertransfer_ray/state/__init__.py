"""Per-partition lineage manifests for resumable output."""
