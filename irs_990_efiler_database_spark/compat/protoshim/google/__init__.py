"""Shim namespace — see compat.protoshim. Only present on sys.path
when the real google.protobuf wheel is missing."""
