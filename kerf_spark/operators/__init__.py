from . import asof, windows, relational, dedup, similarity, text, multimodal  # noqa: F401
