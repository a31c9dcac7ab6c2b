"""Message base shim (isinstance/type-hint surface)."""

from .internal.builder import PbMessage as Message  # noqa: F401
