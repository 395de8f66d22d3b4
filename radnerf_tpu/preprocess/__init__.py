"""Offline data preprocessing pipeline (video -> training dataset)."""

from .pipeline import PreprocessPipeline, run_pipeline

__all__ = ["PreprocessPipeline", "run_pipeline"]
