from . import phantoms  # noqa: F401
