"""Host-side streaming runtime: native transport + chunked receiver chain."""

from .chain import DecodedPacket, ReceiverChain  # noqa: F401
from .io import FileSink, FileSource, LoopbackRadio, RadioParams  # noqa: F401
