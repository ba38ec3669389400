from . import normalize, pyramid, stats, curves, noise, gradation, clahe  # noqa: F401
