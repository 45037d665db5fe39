from .text import (  # noqa: F401
    DISTRESS_KEYWORDS,
    clean_text,
    combined_text,
    risk_score,
    risk_bucket,
)
from .vectors import cosine_similarity, dot_product, l2_norm, to_double_array  # noqa: F401
