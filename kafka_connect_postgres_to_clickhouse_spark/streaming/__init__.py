from .pipeline import changelog_file_stream, run_cdc_pipeline, read_state

__all__ = ["changelog_file_stream", "run_cdc_pipeline", "read_state"]
