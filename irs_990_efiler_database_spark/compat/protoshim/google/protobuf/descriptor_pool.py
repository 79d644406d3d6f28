"""Shim descriptor pool: AddSerializedFile parses the embedded
FileDescriptorProto and builds the message classes immediately."""

from __future__ import annotations

from .internal._mini_runtime import MiniFileDescriptor, parse_file_descriptor

_default_pool = None


class _MiniPool:
    def __init__(self):
        self._files: dict[str, MiniFileDescriptor] = {}

    def AddSerializedFile(self, data: bytes) -> MiniFileDescriptor:  # noqa: N802
        fd = MiniFileDescriptor(parse_file_descriptor(data))
        self._files[fd.name] = fd
        return fd


def Default() -> _MiniPool:  # noqa: N802 — protobuf API name
    global _default_pool
    if _default_pool is None:
        _default_pool = _MiniPool()
    return _default_pool
