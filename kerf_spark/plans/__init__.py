from . import kerf_lang, kerfsql  # noqa: F401
