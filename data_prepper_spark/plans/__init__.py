"""Pipeline-spec → DataFrame compiler (the Data Prepper YAML analog)."""

from .compiler import compile_pipeline, run_pipeline  # noqa: F401
