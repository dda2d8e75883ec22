from . import iq  # noqa: F401
