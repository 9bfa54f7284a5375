from .build import get_lib, available  # noqa: F401
