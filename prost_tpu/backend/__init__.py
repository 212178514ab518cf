"""Algorithm backends (TPU-native counterpart of
/root/reference/src/backend)."""

from .pdhg import BackendPDHG, PDHGOptions

__all__ = ["BackendPDHG", "PDHGOptions"]
