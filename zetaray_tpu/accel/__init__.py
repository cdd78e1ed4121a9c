from .intersect import Hit, intersect_closest, intersect_any  # noqa: F401
