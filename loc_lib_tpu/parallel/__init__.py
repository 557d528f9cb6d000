from . import mesh, match  # noqa: F401
