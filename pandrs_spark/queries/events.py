"""Placeholder — populated in later batches."""
