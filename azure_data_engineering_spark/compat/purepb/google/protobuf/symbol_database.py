"""Symbol database shim: generated modules only grab Default()."""

class SymbolDatabase:
    def RegisterMessage(self, message):
        return message

_default = SymbolDatabase()

def Default():
    return _default
