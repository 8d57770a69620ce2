"""Host-side IO: native tabular loader (C++ via ctypes) with NumPy fallback."""

from .native_loader import load_csv, shuffled_indices, native_available

__all__ = ["load_csv", "shuffled_indices", "native_available"]
