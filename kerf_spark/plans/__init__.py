from . import kerfsql  # noqa: F401
