"""utils/hugepages: allocation helpers must be drop-in equivalents of the
plain numpy calls (the THP advice is a kernel hint, not a semantic)."""
import numpy as np

from graph_kmer_index_tpu.utils.hugepages import (
    hp_empty, hp_zeros, madvise_hugepage)


def test_hp_empty_zeros_shapes_dtypes():
    a = hp_empty((7, 3), np.int32)
    assert a.shape == (7, 3) and a.dtype == np.int32
    z = hp_zeros(11, np.uint64)
    assert z.shape == (11,) and z.dtype == np.uint64
    assert not z.any()


def test_madvise_large_buffer_reports_and_preserves_contents():
    a = hp_empty(2_000_000, np.uint8)  # >1MB: madvise actually attempted
    a[:] = 7
    assert madvise_hugepage(a) in (True, False)  # no-crash contract
    assert (a == 7).all()  # advice never alters contents


def test_madvise_small_buffer_is_noop():
    a = np.zeros(10, np.uint8)
    assert madvise_hugepage(a) is False
