from . import cnv  # noqa: F401
