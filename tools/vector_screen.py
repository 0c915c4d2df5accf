"""The ONE numpy twin of the operators' ``well_formed_vectors`` screen.

Ground-truth tools (lsh_recall_check, clustered_probe) must shed
exactly the rows the operators shed — non-null, exactly ``dim`` long,
no NULL components, all finite, every |component| <= VEC_COMPONENT_CAP
— or their denominators drift from what the plan actually saw (the r13
advisor's under-reported-recall bug class). The r14 review found the
screen hand-rolled in two tools already diverging on how ``dim`` is
chosen; this module is the single implementation both import.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polario_spark.operators.similarity import VEC_COMPONENT_CAP  # noqa: E402


def screen_vectors(rows, ids=None, dim=None):
    """(kept_ids_or_None, float64 matrix, dim) after the full screen.

    ``rows`` is a list of (list | None) as pyarrow's to_pylist yields;
    ``ids`` an optional parallel id list, filtered in lockstep. ``dim``
    defaults to the corpus's modal length (corpus-agnostic tools); pass
    it explicitly to mirror an operator's fixed-dim contract. Length
    and NULL-component screening happen BEFORE the array builds — one
    ragged row would otherwise make an object-dtype array and crash.
    """
    lengths = [len(r) for r in rows if r is not None]
    if not lengths:
        d = dim or 0
        return (np.asarray([]) if ids is not None else None,
                np.zeros((0, d)), d)
    if dim is None:
        # modal length; a 50/50 tie breaks to the SMALLEST length (max
        # keeps the first of equal-count candidates in sorted order) —
        # deterministic across Python builds, unlike iterating a set
        # (r14 ADVICE)
        dim = max(sorted(set(lengths)), key=lengths.count)
    keep = [
        i
        for i, r in enumerate(rows)
        if r is not None and len(r) == dim and not any(v is None for v in r)
    ]
    m = np.asarray([rows[i] for i in keep], dtype=np.float64)
    if m.size:
        ok = (
            np.isfinite(m).all(axis=1)
            & (np.abs(m) <= float(VEC_COMPONENT_CAP)).all(axis=1)
        )
    else:
        ok = np.zeros(0, dtype=bool)
    m = m[ok]
    if ids is None:
        return None, m, dim
    kept_ids = np.asarray([ids[i] for i in keep])[ok]
    return kept_ids, m, dim
