"""Physical-plan inspection & partitioning helpers."""
