from . import io, catalog  # noqa: F401
