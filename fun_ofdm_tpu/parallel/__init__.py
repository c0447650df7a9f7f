from . import mesh, stream_shard  # noqa: F401
