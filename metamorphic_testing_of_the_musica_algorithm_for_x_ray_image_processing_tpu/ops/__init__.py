from . import normalize, pyramid, stats, curves, noise, gradation  # noqa: F401
