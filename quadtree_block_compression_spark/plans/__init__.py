"""Pipeline orchestration: staged execution, checkpoints, lineage."""
