"""PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference BBC-News
pipeline (see SURVEY.md; reference at /root/reference: Airflow + Scrapy +
MongoDB + pandas/NLTK/gensim) as declarative Spark DataFrame / SQL /
Structured Streaming plans, extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis) designed for a
1000-executor / 100 TB deployment.

Design rules (enforced across the package):
  * DataFrame/SQL first — Catalyst owns physical strategy (pushdown,
    broadcast selection, AQE); we only hint where we know better
    (``F.broadcast`` on genuinely small dims).
  * No row-at-a-time Python in hot paths; Pandas UDFs (Arrow) only where
    built-ins cannot express the semantics (model inference, HTML parse).
  * No ``collect()`` inside operators — everything returns a lazy plan.
"""

from .session import get_spark

__all__ = ["get_spark"]
