"""Container tests — ports of reference tests/test_nplist.py,
test_npset.py, test_multi_value_hashtable.py plus LogN/Modulo hash maps."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from graph_kmer_index_tpu.containers import (
    NpList, NpSet, MultiValueHashTable, LogNHashMap, ModuloHashMap,
    HashTable, Counter)


def test_nplist():
    lst = NpList()
    lst.append(5.0)
    lst.append(10.0)
    assert np.all(lst.get_nparray() == [5.0, 10.0])

    lst2 = NpList(dtype=np.uint32)
    for i in range(10000):
        lst2.append(i)
    array = lst2.get_nparray()
    assert array.dtype == np.uint32
    assert len(array) == 10000
    assert len(lst) == 2
    assert len(lst2) == 10000


def test_nplist_extend():
    lst = NpList()
    lst.append(10.0)
    lst.extend([1, 3, 4, 1, 5, 5])
    assert np.all(lst.get_nparray() == [10.0, 1, 3, 4, 1, 5, 5])
    lst.append(100)
    assert lst[-1] == 100


def test_nplist_copy_and_truncate():
    lst = NpList()
    lst.append(10)
    lst.append(100)
    lst.extend(list(range(100)))
    l2 = lst.copy()
    assert l2 == lst
    lst.set_n_elements(2)
    assert np.all(lst.get_nparray() == [10, 100])


def test_npset():
    s = NpSet([1, 5, 3, 100, 200])
    assert 1 in s
    assert 2 not in s
    assert 200 in s
    assert 100 in s


def test_multi_value_hashtable():
    h = MultiValueHashTable.from_keys_and_values(
        [1, 2, 3, 1],
        {"nodes": np.array([1, 2, 3, 10]),
         "offsets": np.array([5, 3, 2, 100])}, mod=11)
    assert np.all(h[1]["nodes"] == [1, 10])
    assert np.all(h[2]["offsets"] == [3])


def test_logn_hash_map():
    m = LogNHashMap(np.array([5, 10, 20], dtype=np.int64))
    assert m.hash(5) == 0
    assert m.hash(20) == 2
    assert m.hash(7) is None
    assert m.unhash(1) == 10


def test_modulo_hash_map():
    m = ModuloHashMap.from_sorted_array(np.array([11, 23, 35]), modulo=101)
    assert m.hash(23, modulo=101) == 1
    assert m.hash(35, modulo=101) == 2


def test_hashtable_multi_values():
    t = HashTable(np.array([3, 1, 3, 7]), np.array([30, 10, 31, 70]))
    assert list(t[3]) == [30, 31]
    assert list(t[1]) == [10]
    assert len(t[99]) == 0
    # vectorized lookup on a multi-map would have to drop values — it
    # refuses loudly instead (scalar path per key is the multi-map API)
    import pytest
    with pytest.raises(ValueError):
        t[np.array([1, 3, 99])]
    # on a unique-key table it is the batched fast path: value or 0
    u = HashTable(np.array([3, 1, 7]), np.array([30, 10, 70]))
    assert list(u[np.array([1, 3, 99])]) == [10, 30, 0]


def test_counter():
    c = Counter(np.array([2, 4, 6]))
    c.count(np.array([2, 2, 6, 9]))
    assert list(c[np.array([2, 4, 6, 9])]) == [2, 0, 1, 0]


def test_counter_array_values_align_with_caller_keys():
    """Counter(keys, values-array): values follow the CALLER's key order
    even though the stored keys are sorted/dedup'd (they used to be
    applied positionally to the sorted order, silently misaligning)."""
    c = Counter(np.array([5, 2, 9]), values=np.array([10, 20, 30]))
    assert list(c[np.array([2, 5, 9])]) == [20, 10, 30]
    # duplicate keys sum their values
    d = Counter(np.array([4, 4, 1]), values=np.array([3, 4, 7]))
    assert list(d[np.array([1, 4])]) == [7, 7]
