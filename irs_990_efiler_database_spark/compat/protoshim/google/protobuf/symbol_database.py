"""Shim symbol database: the generated module only grabs the default
instance; nothing queries it afterwards."""


class _MiniSymbolDatabase:
    def RegisterMessage(self, message):  # noqa: N802
        return message

    def RegisterFileDescriptor(self, fd):  # noqa: N802
        return fd


_instance = _MiniSymbolDatabase()


def Default() -> _MiniSymbolDatabase:  # noqa: N802
    return _instance
