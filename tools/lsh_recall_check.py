"""Ground-truth recall check for the sized-LSH probe points (r13).

Computes the EXACT number of vector pairs with cosine >= tau in a probe
corpus (blocked numpy GEMM over the parquet embeddings — no Spark, no
LSH), so a probe row's ``rows_out`` (the LSH-found pair count under the
count sink) divides into an observed recall number. The sized rule's
contract is >= LSH_SIZED_RECALL (0.9) CANDIDATE recall under the
hyperplane collision model; found pairs are exact-verified, so
found/true IS the end-to-end recall (a found pair is never false).

Usage: python tools/lsh_recall_check.py <sf_dir> <tau> [found_pairs]
Prints one JSON line {"n": ..., "tau": ..., "true_pairs": ...,
"found_pairs": ..., "recall": ...}.

CAUTION: this is a CPU-saturating BLAS job (x100 = 4e10 cosines) — never
run it concurrently with a probe or bench measurement.
"""

from __future__ import annotations

import glob
import json
import sys

import os

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_screen import screen_vectors  # noqa: E402


def true_pairs(sf_dir: str, tau: float, block: int = 4096) -> tuple[int, int]:
    """(n_vectors, exact count of unordered pairs with cos >= tau)."""
    paths = sorted(glob.glob(f"{sf_dir}/embeddings.parquet/*.parquet")) or [
        f"{sf_dir}/embeddings.parquet"
    ]
    # match the operator's malformed-input contract (well_formed_vectors)
    # via the shared screen_vectors twin — one implementation for every
    # ground-truth tool (r13 advisor; r14 review). dim comes from the
    # corpus mode length so the tool stays corpus-agnostic.
    rows: list = []
    for p in paths:
        t = pq.read_table(p, columns=["embedding"])
        rows.extend(t.column("embedding").to_pylist())
    _, m, _ = screen_vectors(rows)
    n = m.shape[0]
    norms = np.maximum(np.sqrt((m * m).sum(axis=1)), 1e-12)
    u = m / norms[:, None]
    total = 0
    # the operator keeps pairs with round(cos, 4) >= tau — the bucketed
    # verify rounds with np.round (half-to-EVEN), not Spark F.round's
    # HALF_UP (see bucket_pairs); c >= tau - 5e-5 admits everything
    # either rounding mode would keep, sidestepping the boundary (where
    # the two modes differ on a measure-zero set in float64 anyway)
    cut = tau - 5e-5
    for i in range(0, n, block):
        bi = u[i : i + block]
        # full row-block x corpus GEMM; count strictly-upper-triangle hits
        sims = bi @ u.T
        hits = sims >= cut
        for r in range(bi.shape[0]):
            gi = i + r
            total += int(hits[r, gi + 1 :].sum())
    return n, total


def main() -> int:
    sf_dir, tau = sys.argv[1], float(sys.argv[2])
    found = int(sys.argv[3]) if len(sys.argv) > 3 else None
    n, tp = true_pairs(sf_dir, tau)
    out = {"n": n, "tau": tau, "true_pairs": tp}
    if found is not None:
        out["found_pairs"] = found
        out["recall"] = round(found / tp, 4) if tp else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
