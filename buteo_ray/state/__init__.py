"""Cross-run state: checkpoint/resume manifests, per-partition lineage,
skew accounting."""
