from . import comm, mesh  # noqa: F401
