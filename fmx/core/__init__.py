from fmx.core import linalg  # noqa: F401
