"""Minimal google.protobuf stand-in (see internal/_mini_runtime.py).
Covers exactly the surface pyspark's generated StateMessage_pb2.py
touches; importing anything else fails loudly."""

__version__ = "0.0-minishim"
