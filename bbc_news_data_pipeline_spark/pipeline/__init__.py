from .runner import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
