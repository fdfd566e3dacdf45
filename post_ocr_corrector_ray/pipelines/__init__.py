"""Assembled Ray Data pipelines."""
