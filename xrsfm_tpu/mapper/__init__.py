from .incremental import IncrementalMapper, MapperOptions  # noqa: F401
