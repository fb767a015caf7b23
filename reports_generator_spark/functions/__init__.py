from .text import (
    EN_STOPWORDS,
    tokens_col,
    shingles_col,
    exploded_shingles,
    with_token_array,
    en_stopword_ratio,
    fingerprint_col,
    quality_score_col,
)

__all__ = [
    "EN_STOPWORDS",
    "tokens_col",
    "shingles_col",
    "exploded_shingles",
    "with_token_array",
    "en_stopword_ratio",
    "fingerprint_col",
    "quality_score_col",
]
