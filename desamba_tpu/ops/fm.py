"""Batched FM-index primitives on device (jax.numpy path).

The TPU analog of occ (bwt.c:43-65): the 16-bit-LUT popcount becomes a
masked SWAR popcount over per-char bit-planes; thousands of backward
extensions run in lockstep to hide HBM gather latency. This module is
jit-compiled XLA (gather + VPU popcount fuse well); the Pallas kernels
live in ops/matchblock.py where hand-tiling pays off.

All row arithmetic is int32 (per-shard rows < 2^31, see DESIGN.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


class FmArrays:
    """Device-resident FM index arrays (a jax pytree).

    The occ tables are re-laid-out at load time from the reference's
    256 bp checkpoint blocks (bwt.c:33-41) into 32 bp blocks whose
    (cumulative base count, bit word) pairs sit ADJACENT in memory:
    `occ32[blk32, c]` is one aligned 8-byte row. occ() — the single
    hottest gather of the whole classify pipeline, issued per character
    of every FM extension — then needs exactly ONE 8 B gather instead of
    the 256 bp layout's 32 B word gather + separate base gather (4.5x
    less random-gather volume, measured as the bulk of stage-2 time).
    Costs ~1.25 B/bp of HBM vs the raw layout's ~0.8 B/bp — capacity is
    the sharded engine's job, speed is this layout's."""

    def __init__(self, ti=None, device=None, _from=None):
        if _from is not None:
            (self.occ32, self.pad, self.rank, self.hash13,
             self.sa_uni, self.sa_off, self.dollar_pos, self.L,
             self.lfc), () = _from
            return
        put = partial(jax.device_put, device=device)
        base = np.asarray(ti.bwt_base, dtype=np.int64)[:, :5]  # [n_blk, 5]
        bits = np.asarray(ti.bwt_bits, dtype=np.uint32)        # [n_blk, 5, 8]
        n_blk = bits.shape[0]
        pc = _popcount_np(bits)                                # [n_blk, 5, 8]
        excl = np.cumsum(pc, axis=2) - pc                      # within-block
        base32 = (base[:, :, None] + excl).astype(np.uint32)
        occ32 = np.stack(
            [base32, bits], axis=3)                            # [n_blk, 5, 8, 2]
        self.occ32 = put(jnp.asarray(
            occ32.transpose(0, 2, 1, 3).reshape(n_blk * 8, 5, 2)))
        self.pad = put(jnp.asarray(ti.bwt_pad, dtype=jnp.uint8))  # [n_blk*256]
        self.rank = put(jnp.asarray(np.asarray(ti.rank), dtype=jnp.int32))  # [6]
        self.hash13 = put(jnp.asarray(ti.hash13, dtype=jnp.int32))
        self.sa_uni = put(jnp.asarray(ti.sa_uni, dtype=jnp.int32))
        self.sa_off = put(jnp.asarray(ti.sa_off, dtype=jnp.int32))
        # LEAVES (0-d int32), not static aux: they differ per index shard,
        # so the 'index'-sharded engine stacks them like any other array
        self.dollar_pos = put(jnp.asarray(int(ti.dollar_pos), dtype=jnp.int32))
        self.L = put(jnp.asarray(int(ti.L), dtype=jnp.int32))
        self.lfc = put(jnp.asarray(_build_lfc(
            np.asarray(ti.bwt_pad),
            base32.transpose(0, 2, 1).reshape(n_blk * 8, 5),
            bits.transpose(0, 2, 1).reshape(n_blk * 8, 5),
            np.asarray(ti.rank, dtype=np.int64), int(ti.dollar_pos),
            int(ti.L))))


LFC_SHIFT = 29          # char in bits 29-31, next row in bits 0-28
LFC_ROW_MASK = (1 << LFC_SHIFT) - 1


def _popcount_np(a: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):  # numpy >= 2.0
        return np.bitwise_count(a).astype(np.int64)
    return np.unpackbits(a.view(np.uint8), axis=-1).reshape(
        *a.shape, 32).sum(axis=-1, dtype=np.int64)


def _build_lfc(pad: np.ndarray, base32: np.ndarray, bits32: np.ndarray,
               rank: np.ndarray, dollar_pos: int, L: int) -> np.ndarray:
    """Fused LF table: lfc[r] = (char(r) << 29) | LF(r).

    lf_cur's (bwt_char, occ) pair is TWO dependent HBM gathers per LF
    step — the row walks (cly.c:1339-1378 analog) and SA resolution
    (cly.c:1353-1359 analog) pay them serially at every step. One uint32
    per row fuses both into ONE gather, halving both the gather count
    and the serial latency chain of stages 2-3. Costs 4 B/row of HBM
    (~400 MB at 100 Mbp) — v5e HBM capacity buys speed here.

    char 0-5 as in the raw stream; pad nibbles (> 5) and rows >= L store
    char 7 with next = 0 (callers treat c > 5 as bad). Rows must fit 29
    bits (L < 2^29 per shard; beyond that shard the index)."""
    n_rows = pad.shape[0]
    if L + int(rank[5]) >= (1 << LFC_SHIFT):
        raise NotImplementedError(
            "index shard exceeds 2^29 BWT rows; shard the index "
            "(parallel/shard_index.py)")
    r = np.arange(n_rows, dtype=np.int64)
    c = pad.astype(np.int64)
    bad = (c > 5) | (r >= L)
    cs = np.where(bad, 0, c)
    c_occ = np.minimum(cs, 4)
    w = r >> 5
    base_v = base32[w, c_occ].astype(np.int64)
    mask = (np.uint32(1) << (r & 31).astype(np.uint32)) - np.uint32(1)
    within = _popcount_np(bits32[w, c_occ] & mask)
    v = base_v + within
    v = np.where(cs == 5, dollar_pos, v)
    nxt = v + rank[np.minimum(cs, 5)]
    out = np.where(bad, np.uint32(7) << LFC_SHIFT,
                   (cs.astype(np.uint32) << LFC_SHIFT)
                   | nxt.astype(np.uint32))
    return out.astype(np.uint32)


jax.tree_util.register_pytree_node(
    FmArrays,
    lambda fm: (
        (fm.occ32, fm.pad, fm.rank, fm.hash13, fm.sa_uni, fm.sa_off,
         fm.dollar_pos, fm.L, fm.lfc),
        (),
    ),
    lambda aux, leaves: FmArrays(_from=(leaves, aux)),
)


def occ(fm: FmArrays, r, c):
    """Count of char c in rows [0, r). r:int32[B], c:int32[B] (0..4)."""
    r = jnp.asarray(r, jnp.int32)
    c = jnp.asarray(c, jnp.int32)
    pair = fm.occ32[r >> 5, c]  # [B, 2]: (base count, bit word) — 1 gather
    nbits = (r & 31).astype(jnp.uint32)
    m = (jnp.uint32(1) << nbits) - jnp.uint32(1)
    return (pair[:, 0] + popcount32(pair[:, 1] & m).astype(jnp.uint32)
            ).astype(jnp.int32)


def bwt_char(fm: FmArrays, r):
    """Code at row r (includes pad nibbles past L, like the C)."""
    return fm.pad[jnp.asarray(r, jnp.int32)].astype(jnp.int32)


def lf_cur(fm: FmArrays, r):
    """occ with c=0xff + rank[c]: returns (char, next_row) per lane.

    ONE fused-table gather (see _build_lfc) instead of the raw
    bwt_char + occ pair — two DEPENDENT gathers that serialized every
    LF step of the row walks and SA resolution.

    char 5 ('$') maps to DOLLOR_POS + rank[5] (bwt.c:55 + caller rank
    add); char > 5 (pad nibble 0xF) comes back as 7 (caller aborts)."""
    w = fm.lfc[jnp.asarray(r, jnp.int32)]
    c = (w >> LFC_SHIFT).astype(jnp.int32)
    nxt = (w & jnp.uint32(LFC_ROW_MASK)).astype(jnp.int32)
    return c, nxt


@partial(jax.jit, static_argnames=("max_steps", "return_state"))
def interval_search(fm: FmArrays, bin2, base_off, s_idx, sp0, ep0,
                    max_rst, l_min, l_max, max_steps: int = 4096,
                    lanes=None, state=None, return_state: bool = False):
    """Lockstep main loop of bwt_MEM_search (cly.c:1399-1417).

    bin2: int32[B, W] padded read codes (both strands concatenated rows);
    base_off+s_idx locate the rightmost pattern char; search starts after
    the 13-char hash prefix. `lanes` (int32[B], optional) maps each search
    lane to its bin2 row so many searches can share one read row without
    materializing copies. Returns dict of per-lane results:
      status: 0 = broke at `new_sp+max_rst >= new_ep` or `new_sp+1 >= new_ep`
              1 = returned 0 (l_max reached)
      sp, ep: the final new interval; match_len: chars before the break char;
      ptr: index of the next unread char (for the row walks).

    `state`/`return_state` support iterate-compact-iterate (the caller runs
    a few lockstep steps on every lane, compacts the survivors, and resumes
    only those — done lanes would otherwise keep paying the occ gathers of
    every remaining iteration): return_state=True returns the raw carry
    (sp/ep/nsp/nep/match_len/ptr/done/status); passing it (sliced) back as
    `state` resumes exactly where the previous call stopped.
    """
    B = sp0.shape[0]
    i32 = jnp.int32
    L_PRE = 13
    state = state if state is not None else dict(
        sp=jnp.asarray(sp0, i32),
        ep=jnp.asarray(ep0, i32),
        nsp=jnp.zeros(B, i32),
        nep=jnp.zeros(B, i32),
        match_len=jnp.full(B, L_PRE, i32),
        ptr=jnp.asarray(s_idx, i32) - L_PRE,
        done=jnp.zeros(B, jnp.bool_),
        status=jnp.zeros(B, i32),
    )
    W = bin2.shape[1]
    rows = jnp.arange(B, dtype=i32) if lanes is None else jnp.asarray(lanes, i32)

    def body(st):
        ptr = st["ptr"]
        ok = (ptr >= 0) & (ptr < W)
        ch = jnp.where(ok, bin2[rows, jnp.clip(ptr, 0, W - 1)], 255)
        valid_c = ch <= 5
        cc = jnp.clip(ch, 0, 5).astype(i32)
        c_occ = jnp.clip(cc, 0, 4)
        # one fused occ over [sp; ep]: halves the gather dispatches per
        # step. (Round-5 measured: clamping DONE lanes' addresses to row 0
        # does NOT help on TPU — the gather unit is DMA-descriptor-bound,
        # so duplicate indices cost the same as random ones; see
        # tools/gather_bench.py where sorted indices are no faster.)
        act = ~st["done"]
        both = occ(fm, jnp.concatenate([st["sp"], st["ep"]]),
                   jnp.concatenate([c_occ, c_occ]))
        nsp = fm.rank[cc] + both[:B]
        nep = fm.rank[cc] + both[B:]
        nsp = jnp.where(valid_c, nsp, 0)
        nep = jnp.where(valid_c, nep, 0)
        ml = st["match_len"]
        brk1 = (ml >= l_min - 1) & (nsp + max_rst >= nep)
        ret0 = (ml >= l_min - 1) & (~brk1) & (ml >= l_max)
        brk2 = (~brk1) & (~ret0) & (nsp + 1 >= nep)
        stop = brk1 | ret0 | brk2
        new = dict(
            sp=jnp.where(act & ~stop, nsp, st["sp"]),
            ep=jnp.where(act & ~stop, nep, st["ep"]),
            nsp=jnp.where(act, jnp.where(stop, nsp, st["nsp"]), st["nsp"]),
            nep=jnp.where(act, jnp.where(stop, nep, st["nep"]), st["nep"]),
            match_len=jnp.where(act & ~stop, ml + 1, ml),
            ptr=jnp.where(act, ptr - 1, ptr),
            done=st["done"] | (act & stop),
            status=jnp.where(act & ret0, 1, st["status"]),
        )
        return new

    def cond(st):
        return ~jnp.all(st["done"])

    # bounded while: also guard with max_steps via fori-style counter
    def body2(carry):
        st, it = carry
        return body(st), it + 1

    def cond2(carry):
        st, it = carry
        return cond(st) & (it < max_steps)

    state, _ = jax.lax.while_loop(cond2, body2, (state, 0))
    if return_state:
        return state
    return dict(
        sp=state["nsp"], ep=state["nep"], match_len=state["match_len"],
        ptr=state["ptr"], status=state["status"],
    )


@partial(jax.jit, static_argnames=("trace_cap", "with_trace", "return_state"))
def row_walks(fm: FmArrays, bin2, start_rows, ptrs, max_lens,
              trace_cap: int = 96, lanes=None, with_trace: bool = True,
              state=None, return_state: bool = False):
    """Lockstep bwt_single_search (cly.c:1339-1378) WITHOUT the sp_set
    dedup (the host replays dedup from the returned row trace).

    Per lane: walk from start_rows[b], matching bin2[b, ptr], ptr
    decreasing. `lanes` (int32[B], optional) maps walk lanes to bin2 rows;
    with_trace=False skips materializing the [B, trace_cap] trace (fast
    mode needs only steps/final_sp). Returns:
      trace: int32[B, trace_cap] the new_sp value of every step taken
      steps: matched step count (== match_len)
      bad_char: lane hit a pad nibble > 5 (the C would xassert-abort)
      overflow: walk exceeded trace_cap (host must replay in full)
    """
    B = start_rows.shape[0]
    i32 = jnp.int32
    W = bin2.shape[1]
    rows = jnp.arange(B, dtype=i32) if lanes is None else jnp.asarray(lanes, i32)

    def step(carry, _):
        sp, ptr, n, done, bad = carry
        c, nxt = lf_cur(fm, sp)
        ok = (ptr >= 0) & (ptr < W)
        want = jnp.where(ok, bin2[rows, jnp.clip(ptr, 0, W - 1)], -1)
        is_bad = c > 5
        match = (c == want) & (n < max_lens) & ~is_bad
        act = ~done
        new_done = done | (act & ~match)
        out_row = jnp.where(act & match, nxt, -1) if with_trace else -1
        return (
            jnp.where(act & match, nxt, sp),
            jnp.where(act & match, ptr - 1, ptr),
            jnp.where(act & match, n + 1, n),
            new_done,
            bad | (act & is_bad & (n < max_lens)),
        ), out_row

    init = state if state is not None else (
        jnp.asarray(start_rows, i32),
        jnp.asarray(ptrs, i32),
        jnp.zeros(B, i32),
        jnp.zeros(B, jnp.bool_),
        jnp.zeros(B, jnp.bool_),
    )
    if with_trace:
        (sp_f, ptr_f, n_f, done_f, bad_f), trace = jax.lax.scan(
            step, init, None, length=trace_cap
        )
    else:
        # no trace to materialize -> early-exit while_loop: walks are
        # short on average (a couple of LF steps) and the scan would pay
        # for trace_cap sequential HBM-gather rounds regardless
        def cond(carry):
            st, it = carry
            return ~jnp.all(st[3]) & (it < trace_cap)

        def body(carry):
            st, it = carry
            nst, _ = step(st, None)
            return nst, it + 1

        fin, _ = jax.lax.while_loop(cond, body, (init, 0))
        if return_state:  # resumable carry for iterate-compact-iterate
            return fin
        (sp_f, ptr_f, n_f, done_f, bad_f) = fin
        trace = None
    overflow = ~done_f  # still matching after trace_cap steps
    # stop reason: max-len stop excludes the final row from SA tracking
    # (the C breaks before the sa update, cly.c:1351-1359)
    stop_max = n_f >= jnp.asarray(max_lens, jnp.int32)
    return dict(
        trace=trace.T if with_trace else None,
        steps=n_f, final_sp=sp_f, final_ptr=ptr_f,
        bad_char=bad_f, overflow=overflow, stop_max=stop_max,
    )
