"""Descriptor classes for the mini-runtime (pure Python only)."""

from .internal.mini_runtime import (  # noqa: F401 - re-exported API
    Descriptor,
    EnumDescriptor,
    EnumValueDescriptor,
    FieldDescriptor,
    FileDescriptor,
    OneofDescriptor,
)

# generated modules branch on this to decide whether the C accelerator
# owns the descriptors; the shim is always the pure-Python path
_USE_C_DESCRIPTORS = False
