from . import channel, ber  # noqa: F401
