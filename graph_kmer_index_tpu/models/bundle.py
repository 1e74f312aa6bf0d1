"""IndexBundle — the KAGE genotyper's bundle of indexes in one file
(reference index_bundle.py:9-19; the reference serializes via the external
shared_memory_wrapper — here a plain npz-of-pickles container).
"""
from __future__ import annotations

import pickle


class IndexBundle:
    index_names = ["VariantToNodes", "NumpyVariants", "NodeCountModelAdvanced",
                   "HelperVariants", "CombinationMatrix", "TrickyVariants",
                   "KmerIndex"]

    def __init__(self, indexes):
        self.indexes = indexes

    def __getitem__(self, name):
        return self.indexes[name]

    def __setitem__(self, name, value):
        self.indexes[name] = value

    def __contains__(self, name):
        return name in self.indexes

    @classmethod
    def from_file(cls, file_name, skip=None):
        with open(file_name, "rb") as f:
            indexes = pickle.load(f)
        if skip:
            indexes = {k: v for k, v in indexes.items() if k not in skip} \
                if isinstance(indexes, dict) else indexes
        return cls(indexes)

    def to_file(self, file_name, compress=True):
        with open(file_name, "wb") as f:
            pickle.dump(self.indexes, f)
        return file_name
