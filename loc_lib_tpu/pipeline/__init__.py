from . import lio, loc  # noqa: F401
