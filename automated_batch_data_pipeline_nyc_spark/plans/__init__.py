from .pipeline import Pipeline, Stage, run_reference_pipeline

__all__ = ["Pipeline", "Stage", "run_reference_pipeline"]
