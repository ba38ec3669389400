from . import histogram  # noqa: F401
