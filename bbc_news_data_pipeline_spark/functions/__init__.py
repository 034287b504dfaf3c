from .cleaning import clean_text_expr, tokens_expr
from .textstats import (
    EN_STOPWORDS_CORE,
    quality_score_cols,
    stop_token_count_expr,
    token_count_regex_expr,
)

__all__ = [
    "clean_text_expr",
    "tokens_expr",
    "EN_STOPWORDS_CORE",
    "quality_score_cols",
    "stop_token_count_expr",
    "token_count_regex_expr",
]
