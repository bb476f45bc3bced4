"""Registration pipelines (library API layer, reference L2)."""
