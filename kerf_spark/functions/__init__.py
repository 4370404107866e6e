from . import temporal, semantics, scalars  # noqa: F401
