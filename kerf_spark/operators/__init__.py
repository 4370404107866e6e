from . import asof, windows, relational, dedup, similarity, text, multimodal, sampling, skew  # noqa: F401
