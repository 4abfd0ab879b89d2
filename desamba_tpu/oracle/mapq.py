"""MAPQ score tables (calculate_MAPQ_TABLE, cly_mt.c:396-420)."""
from __future__ import annotations

import math

import numpy as np

from ..constants import MAX_LV_R_LEN, MAX_LV_WRONG, P_E, Q_MEM_MAX


def mapq_tables(l_ref: int, p_e: float = P_E):
    """Q_MEM[i] and Q_LV[ed][len] with C double->int truncation semantics."""
    ref_size_penalty = -10.0 * math.log(float(l_ref)) / math.log(10.0)
    match_score = -10.0 * math.log(0.25 / (1.0 - p_e)) / math.log(10.0)
    mismatch_penalty = -10.0 * math.log(0.75 / p_e) / math.log(10.0)
    q_mem = np.empty(Q_MEM_MAX, dtype=np.int64)
    for i in range(Q_MEM_MAX):
        q_mem[i] = int(ref_size_penalty + i * match_score + 0.5)  # trunc to 0
    q_lv = np.empty((MAX_LV_WRONG, MAX_LV_R_LEN), dtype=np.int64)
    for j in range(MAX_LV_R_LEN):
        for i in range(MAX_LV_WRONG):
            v = int((j - i) * match_score + i * mismatch_penalty + 0.5)
            if j < 5:
                v += 15
            q_lv[i, j] = max(v, -8)
    return q_mem, q_lv
