"""Shim: generated modules check this flag to decide whether the
descriptor objects accept attribute assignment (pure-Python path)."""

_USE_C_DESCRIPTORS = False
