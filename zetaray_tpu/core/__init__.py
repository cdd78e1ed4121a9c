from . import transforms, sampling, packing  # noqa: F401
