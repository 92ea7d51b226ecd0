"""Repeated-field containers (referenced by generated .pyi stubs and
user code doing isinstance checks)."""

from .mini_runtime import (  # noqa: F401 - re-exported API
    RepeatedCompositeFieldContainer,
    RepeatedScalarFieldContainer,
)
