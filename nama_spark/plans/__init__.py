"""Pipeline orchestration: multi-pass plans, checkpoints, lineage metrics."""
