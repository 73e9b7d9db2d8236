from .pipeline import run_pipeline, blocks_to_records  # noqa: F401
