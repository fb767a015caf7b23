from .text import (
    EN_STOPWORDS,
    tokens_col,
    shingles_col,
    en_stopword_ratio,
    fingerprint_col,
)

__all__ = [
    "EN_STOPWORDS",
    "tokens_col",
    "shingles_col",
    "en_stopword_ratio",
    "fingerprint_col",
]
