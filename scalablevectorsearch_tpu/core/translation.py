"""Bidirectional external <-> internal id translation for dynamic indexes.

Analog of the reference's ``IDTranslator`` (``include/svs/core/translation.h:44``,
``insert`` at ``:100``).  Internal slot ids are dense array indices into the
device-resident dataset/graph; external ids are arbitrary user int64s.  The
map is host-side (numpy + dict) — translation happens at the API boundary, not
inside compiled code, exactly where the reference does it
(``dynamic_index.h:423-443`` translate_to_external after search).
"""

from __future__ import annotations

import numpy as np


class IDTranslator:
    def __init__(self, capacity: int = 0):
        self._ext_to_int: dict[int, int] = {}
        self._int_to_ext = np.full(max(capacity, 1), -1, dtype=np.int64)

    def __len__(self) -> int:
        return len(self._ext_to_int)

    def __contains__(self, external_id: int) -> bool:
        return int(external_id) in self._ext_to_int

    def insert(self, external_ids, internal_slots) -> None:
        """Insert a batch of (external, internal) pairs; raises on duplicate
        external ids (reference behavior: translation.h:100 throws)."""
        external_ids = np.asarray(external_ids, dtype=np.int64)
        internal_slots = np.asarray(internal_slots, dtype=np.int64)
        for ext in external_ids:
            if int(ext) in self._ext_to_int:
                raise ValueError(f"external id {int(ext)} already present")
        max_slot = int(internal_slots.max(initial=-1))
        if max_slot >= self._int_to_ext.size:
            grow = max(max_slot + 1, 2 * self._int_to_ext.size)
            new = np.full(grow, -1, dtype=np.int64)
            new[: self._int_to_ext.size] = self._int_to_ext
            self._int_to_ext = new
        for ext, slot in zip(external_ids, internal_slots):
            self._ext_to_int[int(ext)] = int(slot)
            self._int_to_ext[int(slot)] = int(ext)

    def remove(self, external_ids) -> np.ndarray:
        """Remove external ids, returning their internal slots."""
        slots = np.empty(len(external_ids), dtype=np.int64)
        for i, ext in enumerate(np.asarray(external_ids, dtype=np.int64)):
            slot = self._ext_to_int.pop(int(ext), None)
            if slot is None:
                raise KeyError(f"external id {int(ext)} not present")
            self._int_to_ext[slot] = -1
            slots[i] = slot
        return slots

    def to_external(self, internal_slots) -> np.ndarray:
        """Vectorized internal->external; unmapped slots map to -1."""
        slots = np.asarray(internal_slots, dtype=np.int64)
        out = np.full(slots.shape, -1, dtype=np.int64)
        valid = (slots >= 0) & (slots < self._int_to_ext.size)
        out[valid] = self._int_to_ext[slots[valid]]
        return out

    def to_internal(self, external_ids) -> np.ndarray:
        ext = np.asarray(external_ids, dtype=np.int64)
        return np.array([self._ext_to_int[int(e)] for e in ext.ravel()],
                        dtype=np.int64).reshape(ext.shape)

    def remap(self, old_to_new) -> None:
        """Apply a slot remapping (compaction, reference core/compact.h)."""
        old_to_new = dict(old_to_new)
        new_int_to_ext = np.full_like(self._int_to_ext, -1)
        for ext, slot in list(self._ext_to_int.items()):
            new_slot = old_to_new.get(slot, slot)
            self._ext_to_int[ext] = new_slot
            if new_slot >= new_int_to_ext.size:
                grow = np.full(new_slot + 1, -1, dtype=np.int64)
                grow[: new_int_to_ext.size] = new_int_to_ext
                new_int_to_ext = grow
            new_int_to_ext[new_slot] = ext
        self._int_to_ext = new_int_to_ext

    def all_external_ids(self) -> np.ndarray:
        return np.fromiter(self._ext_to_int.keys(), dtype=np.int64,
                           count=len(self._ext_to_int))
