from . import diagrams, signal_viz  # noqa: F401
