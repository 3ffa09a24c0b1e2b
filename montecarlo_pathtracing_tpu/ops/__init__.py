from . import rng, intersect, sampling  # noqa: F401
