"""Descriptor shim: generated modules only check _USE_C_DESCRIPTORS
and poke attributes onto descriptor bags."""

_USE_C_DESCRIPTORS = False
