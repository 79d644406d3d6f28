"""Shim: version validation is a no-op — the mini runtime implements
the stable proto3 wire format, which is what compatibility actually
requires here."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:  # noqa: N802
    return None
