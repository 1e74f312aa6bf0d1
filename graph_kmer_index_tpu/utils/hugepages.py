"""Transparent-hugepage-backed numpy allocation.

This host runs THP in ``madvise`` mode and first-touch page faults cost
~150us each (sandboxed kernel): filling a fresh 64MB buffer takes ~4s at
4KB pages but ~17ms after MADV_HUGEPAGE (measured).  Every allocate-then-
fill of a large array should therefore go through :func:`hp_empty` /
:func:`hp_zeros`, which advise the kernel to back the range with 2MB
pages *before* the first write.

No-ops anywhere madvise is unavailable.  Safe on already-touched memory
(madvise(MADV_HUGEPAGE) only affects future faults).
"""
import ctypes
import sys

import numpy as np

_MADV_HUGEPAGE = 14
_PAGE = 4096
_MIN_BYTES = 1 << 20  # don't bother below 1MB

_libc = None
if sys.platform.startswith("linux"):
    try:
        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    except OSError:
        _libc = None


def madvise_hugepage(arr: np.ndarray) -> bool:
    """Advise THP backing for ``arr``'s buffer. Returns True on success."""
    if _libc is None or arr.nbytes < _MIN_BYTES:
        return False
    addr = arr.ctypes.data
    start = (addr + _PAGE - 1) // _PAGE * _PAGE
    end = (addr + arr.nbytes) // _PAGE * _PAGE
    if end <= start:
        return False
    return _libc.madvise(ctypes.c_void_p(start),
                         ctypes.c_size_t(end - start), _MADV_HUGEPAGE) == 0


def hp_empty(shape, dtype) -> np.ndarray:
    a = np.empty(shape, dtype)
    madvise_hugepage(a)
    return a


def hp_zeros(shape, dtype) -> np.ndarray:
    # np.zeros gets lazily-zeroed pages from calloc; the advice must
    # land before the consumer's first write, which this guarantees
    a = np.zeros(shape, dtype)
    madvise_hugepage(a)
    return a


