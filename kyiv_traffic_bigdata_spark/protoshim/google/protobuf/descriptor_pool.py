"""Descriptor pool: the generated module's single entry point for
registering its embedded FileDescriptorProto."""

from .internal.mini_runtime import FileDescriptor, parse_file_descriptor

_default_pool = None


class DescriptorPool:
    def __init__(self):
        self._files_by_name: dict[str, FileDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:  # noqa: N802
        fd = parse_file_descriptor(serialized)
        existing = self._files_by_name.get(fd.name)
        if existing is not None:
            return existing
        self._files_by_name[fd.name] = fd
        return fd

    def FindFileByName(self, name: str) -> FileDescriptor:  # noqa: N802
        return self._files_by_name[name]


def Default() -> DescriptorPool:  # noqa: N802 - protobuf API name
    global _default_pool
    if _default_pool is None:
        _default_pool = DescriptorPool()
    return _default_pool
