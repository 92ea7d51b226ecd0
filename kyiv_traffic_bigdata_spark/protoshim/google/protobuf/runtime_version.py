"""Runtime/gencode version gate — a no-op in the mini-runtime.

The real check guards against gencode newer than the runtime; the shim
implements exactly the wire subset StateMessage.proto uses, and the
e2e parity test is the compatibility check that matters here.
"""

from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(  # noqa: N802 - protobuf API name
    domain, major, minor, patch, suffix, location
):
    return None
