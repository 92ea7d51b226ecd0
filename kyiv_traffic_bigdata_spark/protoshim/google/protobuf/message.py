"""Public message base + exception names (``google.protobuf.message``)."""

from .internal.mini_runtime import (  # noqa: F401 - re-exported API
    DecodeError,
    EncodeError,
    Error,
)
from .internal.mini_runtime import MiniMessage as Message  # noqa: F401
