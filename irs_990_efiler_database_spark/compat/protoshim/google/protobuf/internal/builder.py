"""Shim builder: injects message classes, enum types, enum value
constants, and `_UPPERCASE` descriptor placeholders into the generated
module's globals — the same names the real builder creates."""

from __future__ import annotations

from ._mini_runtime import MiniFileDescriptor, _DescriptorPlaceholder


def BuildMessageAndEnumDescriptors(  # noqa: N802 — protobuf API name
    fd: MiniFileDescriptor, module_globals: dict
) -> None:
    for name in fd.message_classes:
        module_globals[f"_{name.upper()}"] = _DescriptorPlaceholder(name)
    for name in fd.enum_types:
        module_globals[f"_{name.upper()}"] = _DescriptorPlaceholder(name)


def BuildTopDescriptorsAndMessages(  # noqa: N802
    fd: MiniFileDescriptor, module_name: str, module_globals: dict
) -> None:
    for name, cls in fd.message_classes.items():
        cls.__module__ = module_name
        module_globals[name] = cls
    for name, values in fd.enum_types.items():
        enum_cls = type(name, (), dict(values))
        module_globals[name] = enum_cls
        # proto3 exports enum VALUE names at module scope too
        # (stateMessage.PRE_INIT, stateMessage.INITIALIZED, …)
        module_globals.update(values)
