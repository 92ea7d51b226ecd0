"""Minimal pure-Python ``google.protobuf`` facade (see internal/mini_runtime).

Version mirrors the gencode version PySpark's StateMessage_pb2 was
generated with, so any version gate that compares against the
generated module passes.
"""

__version__ = "6.33.0"

#: marker so diagnostics can tell the shim from a real install
__is_protoshim__ = True
