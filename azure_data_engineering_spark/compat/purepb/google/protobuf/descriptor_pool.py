"""Descriptor pool shim: AddSerializedFile parses the serialized
FileDescriptorProto with the bootstrap wire parser."""

from .internal import wire

class DescriptorPool:
    def __init__(self):
        self._files = {}

    def AddSerializedFile(self, serialized):
        fd = wire.parse_file_descriptor(serialized)
        self._files[fd.name] = fd
        return fd

_default = DescriptorPool()

def Default():
    return _default
