from . import dense_conv  # noqa: F401
