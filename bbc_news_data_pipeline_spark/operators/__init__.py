from . import curation, dedup, multimodal, similarity, skew, timeseries, topics

__all__ = [
    "curation",
    "dedup",
    "multimodal",
    "similarity",
    "skew",
    "timeseries",
    "topics",
]
