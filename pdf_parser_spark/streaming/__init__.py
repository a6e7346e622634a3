"""Resumability + lineage (SURVEY.md §2.9): the reference is one-shot
batch; the north rule requires per-partition checkpointing so a killed job
resumes without reprocessing completed partitions."""
