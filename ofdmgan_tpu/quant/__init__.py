from . import export, qformat  # noqa: F401
