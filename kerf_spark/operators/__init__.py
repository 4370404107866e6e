from . import asof, windows, relational, dedup, similarity, text, multimodal, sampling  # noqa: F401
