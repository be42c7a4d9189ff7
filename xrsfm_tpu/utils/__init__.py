from . import geometry, camera  # noqa: F401
