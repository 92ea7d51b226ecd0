"""Generated-code builder: populates a generated module's globals with
descriptors, message classes, and enum constants.

This is the contract the ``protoc`` python_out gencode relies on:
``BuildMessageAndEnumDescriptors`` exposes ``_UPPERNAME`` descriptor
globals (the generated module assigns ``_serialized_start`` offsets to
them afterwards), and ``BuildTopDescriptorsAndMessages`` exposes the
message classes and flattened enum value constants.
"""

from .mini_runtime import make_message_class


def _walk(descriptors, prefix=""):
    for d in descriptors:
        scoped = f"{prefix}{d.name.upper()}"
        yield scoped, d
        yield from _walk(d.nested_types, scoped + "_")


def BuildMessageAndEnumDescriptors(file_des, module_globals):  # noqa: N802
    for scoped, d in _walk(file_des.message_types_by_name.values()):
        module_globals[f"_{scoped}"] = d
        for e in d.enum_types:
            module_globals[f"_{scoped}_{e.name.upper()}"] = e
    for e in file_des.enum_types_by_name.values():
        module_globals[f"_{e.name.upper()}"] = e


def BuildTopDescriptorsAndMessages(  # noqa: N802
    file_des, module_name, module_globals
):
    for d in file_des.message_types_by_name.values():
        cls = make_message_class(d)
        cls.__module__ = module_name
        module_globals[d.name] = cls
    for e in file_des.enum_types_by_name.values():
        module_globals[e.name] = e
        for v in e.values:
            module_globals[v.name] = v.number
