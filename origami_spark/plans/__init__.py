"""Execution plans: checkpointed stage runner, resume, lineage."""
