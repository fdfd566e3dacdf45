"""Checkpoint/resume state: per-partition lineage records and commit markers."""
