"""Symbol database — registration bookkeeping the mini-runtime keeps
only so generated modules can call it."""

_default = None


class SymbolDatabase:
    def __init__(self):
        self._classes = {}

    def RegisterMessage(self, message_class):  # noqa: N802
        self._classes[message_class.DESCRIPTOR.full_name] = message_class
        return message_class

    def GetPrototype(self, descriptor):  # noqa: N802
        cls = descriptor._concrete_class
        if cls is None:
            from .internal.mini_runtime import make_message_class

            cls = make_message_class(descriptor)
        return cls


def Default() -> SymbolDatabase:  # noqa: N802 - protobuf API name
    global _default
    if _default is None:
        _default = SymbolDatabase()
    return _default
