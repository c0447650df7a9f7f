from . import ppdu, rx, tx  # noqa: F401
