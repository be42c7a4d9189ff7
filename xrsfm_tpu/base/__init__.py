from .map import SfMMap  # noqa: F401
