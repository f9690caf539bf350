from .text import clean_line, shingles, tokens, norm_fingerprint
from .vector import cosine, dot, l2_norm

__all__ = [
    "clean_line",
    "shingles",
    "tokens",
    "norm_fingerprint",
    "cosine",
    "dot",
    "l2_norm",
]
