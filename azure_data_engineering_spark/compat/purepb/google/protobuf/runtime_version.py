"""Runtime-version shim: validation is a no-op."""

class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2

def ValidateProtobufRuntimeVersion(*args, **kwargs):
    return None
