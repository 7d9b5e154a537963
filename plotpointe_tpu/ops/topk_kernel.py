"""Pallas TPU kernel: fused MIPS top-K retrieval over a large item catalog.

Serving hot path (`serving/runtime.py:56-76` in the reference: full [N, d] @
[d] GEMV + argpartition on CPU). The kernel streams the item matrix through
VMEM in blocks, computes block scores on the MXU, and maintains a running
top-K (packed sortable keys + indices) in VMEM scratch across the sequential
TPU grid — the [N] score vector never materializes in HBM and the item matrix
is read exactly once at HBM bandwidth.

Selection: packed sortable-int keys. A float32 score is bit-twiddled into a
monotone int32 (sign-flip transform), its low POS_BITS bits replaced by the
candidate's lane position. Keys are then UNIQUE per row, so one selection
round is just (lane-max, compare-equal mask) — 2 VPU passes — instead of the
5-pass (max, argmax, one-hot index select, mask) scheme: the winner's
position decodes arithmetically from the key itself. Truncating POS_BITS
value bits can only reorder candidates closer than 2^-(23-POS_BITS) relative,
so the kernel selects k + SEL_MARGIN candidates and the caller re-scores them
exactly and takes the exact top-k (a true top-k item would have to be
shadowed by >SEL_MARGIN same-bucket candidates to be lost).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 128  # running top-K lane width (>= any practical serving K)
NEG_INF = -1e30
POS_BITS = 13  # low key bits carrying the candidate position (block + run slots <= 8192)
POS_MASK = (1 << POS_BITS) - 1
VAL_MASK = ~POS_MASK
INT_MIN = -(2**31)
SEL_MARGIN = 8  # extra selection rounds guarding against truncated-key ties


def pack_keys(scores: jax.Array, pos: jax.Array) -> jax.Array:
    """float32 scores + int32 positions -> monotone-sortable unique int32 keys.

    Monotone transform: positive floats keep their bit pattern (ascending as
    signed ints); negative floats xor the magnitude bits so more-negative
    sorts lower. Low POS_BITS bits are replaced by (POS_MASK - pos): equal
    truncated scores tie-break to the SMALLER position, and keys are unique
    whenever positions are."""
    s = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(s >= 0, s, s ^ jnp.int32(0x7FFFFFFF))
    return (key & jnp.int32(VAL_MASK)) | (jnp.int32(POS_MASK) - pos)


def unpack_pos(keys: jax.Array) -> jax.Array:
    return jnp.int32(POS_MASK) - (keys & jnp.int32(POS_MASK))


def unpack_value(keys: jax.Array) -> jax.Array:
    """Value with the low POS_BITS mantissa bits zeroed (selection-grade)."""
    kb = keys & jnp.int32(VAL_MASK)
    s = jnp.where(kb >= 0, kb, kb ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(s, jnp.float32)


def merge_topk_keys(
    run_k: jax.Array,  # [B, K_PAD] int32, value bits only (pos bits zero)
    run_i: jax.Array,  # [B, K_PAD] int32 global indices
    keys: jax.Array,  # [B, W] int32 pre-packed candidate keys (pos < w_pos)
    col0: jax.Array,  # scalar int32: global index of position 0's column
    n_rounds: int,
    w_pos: int,  # size of the candidates' position space (>= max pos + 1)
) -> Tuple[jax.Array, jax.Array]:
    """Fold pre-packed candidate keys into the running top-n_rounds. 2
    VPU passes over the candidate width per round (one lane-max reduce, one
    compare+mask write); winner position decodes from the key, run-slot
    indices recover via a K_PAD-wide one-hot (1 vreg). The candidate array
    may be narrower than its position space (w_pos) when callers pre-reduce
    lanes (knn fast mode). Pure jnp — works inside Pallas kernels and XLA."""
    b, w = keys.shape
    assert w_pos + K_PAD <= POS_MASK + 1, "position space too wide for the key field"
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, K_PAD), 1)
    runk = run_k | (jnp.int32(POS_MASK) - (w_pos + slot))  # run slots sit past the block positions
    cand = jnp.concatenate([keys, runk], axis=1)  # [B, W + K_PAD]

    kcol = slot
    new_k = jnp.full((b, K_PAD), INT_MIN, jnp.int32)
    new_i = jnp.zeros((b, K_PAD), jnp.int32)
    for kk in range(n_rounds):
        m = jnp.max(cand, axis=1, keepdims=True)  # [B, 1] — pass 1
        p = jnp.int32(POS_MASK) - (m[:, 0] & jnp.int32(POS_MASK))  # [B]
        rs = p - w_pos  # run-slot id when the winner came from the run side
        oh = slot == rs[:, None]
        ridx = jnp.sum(jnp.where(oh, run_i, 0), axis=1)  # [B] (1 vreg wide)
        sel = jnp.where(p < w_pos, col0 + p, ridx)
        new_k = jnp.where(kcol == kk, m & jnp.int32(VAL_MASK), new_k)
        new_i = jnp.where(kcol == kk, sel[:, None], new_i)
        cand = jnp.where(cand == m, jnp.int32(INT_MIN), cand)  # pass 2
    return new_k, new_i


def merge_topk_packed(
    run_k: jax.Array,  # [B, K_PAD] int32, value bits only (pos bits zero)
    run_i: jax.Array,  # [B, K_PAD] int32 global indices
    scores: jax.Array,  # [B, W] float32 block scores (mask invalid to NEG_INF)
    col0: jax.Array,  # scalar int32: global index of the block's first column
    n_rounds: int,
) -> Tuple[jax.Array, jax.Array]:
    """Pack one score block's keys and fold them into the running top-K."""
    b, w = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    keys = pack_keys(scores, lane)
    return merge_topk_keys(run_k, run_i, keys, col0, n_rounds, w)


def _topk_kernel(nbi: int, b: int, n_rounds: int, n_items: int):
    def kernel(items_ref, q_ref, out_k_ref, out_i_ref, run_k, run_i):
        c = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(c == 0)
        def _():
            run_k[:] = jnp.full((b, K_PAD), INT_MIN, jnp.int32)
            run_i[:] = jnp.zeros((b, K_PAD), jnp.int32)

        scores = jnp.dot(q_ref[:], items_ref[:].T, preferred_element_type=jnp.float32)  # [B, NBI]
        # padding rows exist only in the final block — masking there alone
        # saves 3 full-width VPU passes (iota/compare/select) on every other
        # block of the stream (measured ~15% of kernel time at 498k x 128)
        if n_items % nbi != 0:
            @pl.when(c == n_blocks - 1)
            def _():
                col = jax.lax.broadcasted_iota(jnp.int32, (b, nbi), 1) + c * nbi
                run_k[:], run_i[:] = merge_topk_packed(
                    run_k[:], run_i[:], jnp.where(col < n_items, scores, NEG_INF),
                    c * nbi, n_rounds)

            @pl.when(c < n_blocks - 1)
            def _():
                run_k[:], run_i[:] = merge_topk_packed(run_k[:], run_i[:], scores, c * nbi, n_rounds)
        else:
            nk, ni = merge_topk_packed(run_k[:], run_i[:], scores, c * nbi, n_rounds)
            run_k[:] = nk
            run_i[:] = ni

        @pl.when(c == n_blocks - 1)
        def _():
            out_k_ref[:] = run_k[:]
            out_i_ref[:] = run_i[:]

    return kernel


def _topk_kernel_fast(nbi: int, b: int, n_rounds: int, n_slots: int):
    """Strided slot pre-reduction (the knn fast-mode scheme): packed keys are
    max-reduced across NBI/n_slots lane groups — winner keys keep their
    in-block positions, so indices still decode — and the selection rounds
    run on the [B, n_slots] survivors, cutting round cost by NBI/n_slots
    (~31x at the 3968 block). A block candidate is lost only when >=2 of a
    row's running top-n_rounds land in the SAME block in the SAME lane
    residue class (mod n_slots): expected losses per row
    ~ C(n_rounds,2) / (n_blocks * n_slots) — ≈0.05 at 498k/7936/128, i.e.
    ~99.8% recall@20 — selection-grade approximation; the wrapper's exact
    re-score repairs rank, not recall.
    Padding arrives as an additive validity row (1 VPU pass)."""

    def kernel(items_ref, q_ref, vm_ref, out_k_ref, out_i_ref, run_k, run_i):
        c = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(c == 0)
        def _():
            run_k[:] = jnp.full((b, K_PAD), INT_MIN, jnp.int32)
            run_i[:] = jnp.zeros((b, K_PAD), jnp.int32)

        scores = jnp.dot(q_ref[:], items_ref[:].T, preferred_element_type=jnp.float32)
        scores = scores + vm_ref[0:1, :]  # padding columns -> NEG_INF
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, nbi), 1)
        keys = pack_keys(scores, lane)
        red = keys[:, :n_slots]
        for g in range(1, nbi // n_slots):
            red = jnp.maximum(red, keys[:, g * n_slots : (g + 1) * n_slots])

        nk, ni = merge_topk_keys(run_k[:], run_i[:], red, c * nbi, n_rounds, nbi)
        run_k[:] = nk
        run_i[:] = ni

        @pl.when(c == n_blocks - 1)
        def _():
            out_k_ref[:] = run_k[:]
            out_i_ref[:] = run_i[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "block_items", "mode"))
def topk_mips_pallas(item_vecs: jax.Array, queries: jax.Array, k: int,
                     block_items: int = 0, mode: str = "exact"):
    """Top-k inner-product search. item_vecs: [N, D]; queries: [B, D] (cast
    both to bfloat16 for 2x stream bandwidth when serving tolerates it).
    Returns (indices [B, k] int32, scores [B, k] f32) sorted descending;
    scores are exact f32 re-scores of the selected items. Rows with fewer
    than k real candidates get idx -1 / score -1e30 in the tail lanes.

    mode="exact" (default, reference-parity): every block candidate enters
    the selection rounds. mode="fast": strided slot pre-reduction
    (_topk_kernel_fast) — expected losses/query ~ C(k+8,2)/(n_blocks*128)
    (≈99.8% recall@20 at the 498k catalog), for latency-critical serving."""
    n, d = item_vecs.shape
    b = queries.shape[0]
    if block_items == 0:
        # fast mode pays per-block fixed cost only ~2 selection passes, so
        # bigger blocks win (measured: 7936 -> 27.2k QPS at batch 64 vs 24.3k
        # at 3968); exact mode's rounds scale with block width, keep 3968
        block_items = 7936 if mode == "fast" else 3968
    n_rounds = min(k + SEL_MARGIN, K_PAD)
    assert block_items + K_PAD <= POS_MASK + 1
    n_pad = ((n + block_items - 1) // block_items) * block_items
    if n_pad != n:
        item_vecs_p = jnp.concatenate(
            [item_vecs, jnp.zeros((n_pad - n, d), item_vecs.dtype)], axis=0
        )
    else:
        item_vecs_p = item_vecs
    n_blocks = n_pad // block_items

    common = dict(
        grid=(n_blocks,),
        out_specs=[
            pl.BlockSpec((b, K_PAD), lambda c: (0, 0)),
            pl.BlockSpec((b, K_PAD), lambda c: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, K_PAD), jnp.int32),
            jax.ShapeDtypeStruct((b, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, K_PAD), jnp.int32),
            pltpu.VMEM((b, K_PAD), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d * item_vecs.dtype.itemsize,
            transcendentals=0,
        ),
    )
    if mode == "fast":
        vm = jnp.where(jnp.arange(n_pad) < n, 0.0, NEG_INF).astype(jnp.float32)
        vm2 = jnp.broadcast_to(vm[None, :], (8, n_pad))  # min sublanes
        out_k, out_i = pl.pallas_call(
            _topk_kernel_fast(block_items, b, n_rounds, n_slots=K_PAD),
            in_specs=[
                pl.BlockSpec((block_items, d), lambda c: (c, 0)),
                pl.BlockSpec((b, d), lambda c: (0, 0)),
                pl.BlockSpec((8, block_items), lambda c: (0, c)),
            ],
            **common,
        )(item_vecs_p, queries, vm2)
    else:
        out_k, out_i = pl.pallas_call(
            _topk_kernel(block_items, b, n_rounds, n),
            in_specs=[
                pl.BlockSpec((block_items, d), lambda c: (c, 0)),
                pl.BlockSpec((b, d), lambda c: (0, 0)),
            ],
            **common,
        )(item_vecs_p, queries)

    # exact re-score of the k + margin selected candidates, then exact top-k
    cand_i = out_i[:, :n_rounds]  # [B, R]
    trunc_v = unpack_value(out_k[:, :n_rounds])
    real = trunc_v > NEG_INF / 2
    gathered = item_vecs[jnp.clip(cand_i, 0, n - 1)].astype(jnp.float32)  # [B, R, D]
    exact = jnp.einsum("brd,bd->br", gathered, queries.astype(jnp.float32))
    exact = jnp.where(real, exact, NEG_INF)
    v, pos = jax.lax.top_k(exact, k)  # exact order among survivors
    i = jnp.take_along_axis(cand_i, pos, axis=1)
    i = jnp.where(v > NEG_INF / 2, i, -1)
    return i, v


def topk_mips_xla(item_vecs: jax.Array, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """XLA golden reference: full matmul + hierarchical top_k."""
    from plotpointe_tpu.graphs.knn import _hierarchical_topk

    scores = jnp.dot(queries, item_vecs.T, preferred_element_type=jnp.float32)
    v, i = _hierarchical_topk(scores, k)
    return i, v
