from .sentiment import compound_score_expr, sentiment_label_expr, with_sentiment
from .stopwords import EN_STOPWORDS

__all__ = [
    "compound_score_expr",
    "sentiment_label_expr",
    "with_sentiment",
    "EN_STOPWORDS",
]
