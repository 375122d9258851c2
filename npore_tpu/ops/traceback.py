"""Host traceback over the DP's MAT (TYP, RUN) planes.

Mirrors the reference's per-chunk backtrack (reference: src/aln.pyx:670-742):
walk from (n_ins, n_del) to (0, 0); INS/LEN runs emit 'I', DEL/SHR runs emit
'D', MAT runs emit '='/'X' by comparing bases. Python iterations are per
*run*, with MAT runs compared vectorized, so cost is O(#events), not O(len).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

MAT, INS, LEN, DEL, SHR = 0, 1, 2, 3, 4


def traceback_window(typ: np.ndarray, run: np.ndarray, inss_local: np.ndarray,
                     seq: np.ndarray, ref: np.ndarray, n_ins: int, n_del: int,
                     r: int, errors: Optional[List[str]] = None) -> str:
    """Returns the chunk's extended CIGAR (over '=XID'), already in forward
    order (the reference builds it reversed then flips; src/aln.pyx:742)."""
    arow, acol = n_ins, n_del
    parts: List[str] = []
    eq = np.frombuffer(b"X=", dtype=np.uint8)  # index by bool
    while arow > 0 or acol > 0:
        t = arow + acol
        lane = int(inss_local[t]) - arow + r
        ty = int(typ[t, lane])
        rn = int(run[t, lane])
        if arow < 0 or acol < 0 or rn < 1:
            if errors is not None:
                errors.append(f"traceback error @ ({arow},{acol}) t={t} "
                              f"lane={lane} typ={ty} run={rn}")
            break
        if ty == LEN or ty == INS:
            parts.append("I" * rn)
            arow -= rn
        elif ty == SHR or ty == DEL:
            parts.append("D" * rn)
            acol -= rn
        elif ty == MAT:
            seq_seg = seq[arow - rn:arow][::-1]
            ref_seg = ref[acol - rn:acol][::-1]
            parts.append(eq[(seq_seg == ref_seg).astype(np.uint8)]
                         .tobytes().decode("ascii"))
            arow -= rn
            acol -= rn
        else:
            if errors is not None:
                errors.append(f"unknown type {ty}")
            break
    return "".join(parts)[::-1]
