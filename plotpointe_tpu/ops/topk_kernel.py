"""Pallas TPU kernel: fused MIPS top-K retrieval over a large item catalog.

Serving hot path (`serving/runtime.py:56-76` in the reference: full [N, d] @
[d] GEMV + argpartition on CPU). Two-level exact scheme, built so the stream
loop contains NOTHING but an MXU matmul and one lane-tree max:

  phase 1 (Pallas): stream the item matrix through VMEM in blocks; per block
      compute scores on the MXU and reduce them to per-CHUNK maxima (CHUNK
      consecutive items), writing the tiny [B, N/CHUNK] chunk-max matrix.
      The [N] score vector never materializes in HBM and the catalog is read
      exactly once at HBM bandwidth. No selection state crosses blocks, so
      the grid is fully parallel and Mosaic double-buffers the stream.
  phase 2 (XLA): take the top (k + margin) chunks per query by chunk max,
      gather just those chunks' rows (k+margin contiguous CHUNK-row slabs),
      re-score them exactly in f32, and take the exact top-k.

Exactness: let t be the k-th largest true score of a query. Every chunk
containing a true top-k item has chunk-max >= t, and a chunk's max >= t
implies it CONTAINS an item scoring >= t — i.e. a top-k item (ties aside).
So at most k chunks can rank above any chunk holding a top-k item, and the
top-(k+margin) chunks by max are a superset of the true top-k's chunks.
The margin only absorbs score ties and the ~1-ulp accumulation-order
differences between the phase-1 MXU max and the phase-2 re-score.

This replaces the round-3/4 design (packed sortable-int keys + per-block
selection rounds): the rounds' many small VPU ops made the kernel run at
~15% of HBM bandwidth (BENCH_r04 mfu_topk_bf16_sol_dev 0.144). Phase 2 costs
one extra (k+margin)*CHUNK-row fetch per query — ~57 MB at the 498k x 128
bf16 batch-64 serving shape vs the 128 MB stream — done by a second Pallas
kernel whose per-chunk DMAs ride scalar-prefetched dynamic index maps
(XLA's row gather of the same slabs measured ~25x slower).

The packed-key helpers (pack_keys / merge_topk_keys / merge_topk_packed) are
kept here for the kNN kernel (ops/knn_kernel.py), whose all-pairs blocked
sweep still uses the running-top-K scheme.
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
CHUNK = 128  # phase-2 gather granularity; multiple of the 128-lane tile
# (Mosaic supports the [B, G*128] -> [B, G, 128] minor-preserving reshape)
CHUNK_MARGIN = 8  # extra chunks absorbing ties / accumulation-order jitter


def pack_keys(scores: jax.Array, pos: jax.Array, pos_bits: int = POS_BITS) -> jax.Array:
    """float32 scores + int32 positions -> monotone-sortable unique int32 keys.

    Monotone transform: positive floats keep their bit pattern (ascending as
    signed ints); negative floats xor the magnitude bits so more-negative
    sorts lower. The low pos_bits bits are replaced by (mask - pos): equal
    truncated scores tie-break to the SMALLER position, and keys are unique
    whenever positions are. pos_bits is per-caller: narrow position spaces
    (kNN exact's 2048-wide blocks) keep 12 bits so only 2^-11-relative value
    precision funds the tie-break; wide ones (4096+) need 13."""
    pm = (1 << pos_bits) - 1
    s = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(s >= 0, s, s ^ jnp.int32(0x7FFFFFFF))
    return (key & jnp.int32(~pm)) | (jnp.int32(pm) - pos)


def unpack_pos(keys: jax.Array, pos_bits: int = POS_BITS) -> jax.Array:
    pm = (1 << pos_bits) - 1
    return jnp.int32(pm) - (keys & jnp.int32(pm))


def unpack_value(keys: jax.Array, pos_bits: int = POS_BITS) -> jax.Array:
    """Value with the low pos_bits mantissa bits zeroed (selection-grade)."""
    kb = keys & jnp.int32(~((1 << pos_bits) - 1))
    s = jnp.where(kb >= 0, kb, kb ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(s, jnp.float32)


def merge_topk_keys(
    run_k: jax.Array,  # [B, K_PAD] int32, value bits only (pos bits zero)
    run_i: jax.Array,  # [B, K_PAD] int32 global indices
    keys: jax.Array,  # [B, W] int32 pre-packed candidate keys (pos < w_pos)
    col0: jax.Array,  # scalar int32: global index of position 0's column
    n_rounds: int,
    w_pos: int,  # size of the candidates' position space (>= max pos + 1)
    pos_bits: int = POS_BITS,
) -> Tuple[jax.Array, jax.Array]:
    """Fold pre-packed candidate keys into the running top-n_rounds. 2
    VPU passes over the candidate width per round (one lane-max reduce, one
    compare+mask write); winner position decodes from the key, run-slot
    indices recover via a K_PAD-wide one-hot (1 vreg). The candidate array
    may be narrower than its position space (w_pos) when callers pre-reduce
    lanes (knn fast mode). Pure jnp — works inside Pallas kernels and XLA."""
    b, w = keys.shape
    pm = (1 << pos_bits) - 1
    assert w_pos + K_PAD <= pm + 1, "position space too wide for the key field"
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, K_PAD), 1)
    runk = run_k | (jnp.int32(pm) - (w_pos + slot))  # run slots sit past the block positions
    cand = jnp.concatenate([keys, runk], axis=1)  # [B, W + K_PAD]

    kcol = slot
    new_k = jnp.full((b, K_PAD), INT_MIN, jnp.int32)
    new_i = jnp.zeros((b, K_PAD), jnp.int32)
    for kk in range(n_rounds):
        m = jnp.max(cand, axis=1, keepdims=True)  # [B, 1] — pass 1
        p = jnp.int32(pm) - (m[:, 0] & jnp.int32(pm))  # [B]
        rs = p - w_pos  # run-slot id when the winner came from the run side
        oh = slot == rs[:, None]
        ridx = jnp.sum(jnp.where(oh, run_i, 0), axis=1)  # [B] (1 vreg wide)
        sel = jnp.where(p < w_pos, col0 + p, ridx)
        new_k = jnp.where(kcol == kk, m & jnp.int32(~pm), new_k)
        new_i = jnp.where(kcol == kk, sel[:, None], new_i)
        cand = jnp.where(cand == m, jnp.int32(INT_MIN), cand)  # pass 2
    return new_k, new_i


def merge_topk_packed(
    run_k: jax.Array,  # [B, K_PAD] int32, value bits only (pos bits zero)
    run_i: jax.Array,  # [B, K_PAD] int32 global indices
    scores: jax.Array,  # [B, W] float32 block scores (mask invalid to NEG_INF)
    col0: jax.Array,  # scalar int32: global index of the block's first column
    n_rounds: int,
    pos_bits: int = POS_BITS,
) -> Tuple[jax.Array, jax.Array]:
    """Pack one score block's keys and fold them into the running top-K."""
    b, w = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    keys = pack_keys(scores, lane, pos_bits)
    return merge_topk_keys(run_k, run_i, keys, col0, n_rounds, w, pos_bits)


def _chunkmax_kernel(nbi: int, b: int, n_items: int, chunk: int):
    """Per-block: MXU scores [B, NBI] -> per-chunk maxima in a [B, 128] out
    block (lanes g..127 padded NEG_INF when the block holds g < 128 chunks,
    keeping the out BlockSpec on the 128-lane tile for any block size).

    Padding rows exist only in the final block, so the NEG_INF column mask
    (3 full-width VPU passes) is paid on that one block, not the stream."""
    g = nbi // chunk
    assert g <= 128

    def cmax(scores):
        m = jnp.max(scores.reshape(b, g, chunk), axis=2)  # [B, G]
        if g < 128:
            m = jnp.concatenate([m, jnp.full((b, 128 - g), NEG_INF, jnp.float32)], axis=1)
        return m

    def kernel(items_ref, q_ref, out_ref):
        c = pl.program_id(0)
        n_blocks = pl.num_programs(0)
        scores = jnp.dot(q_ref[:], items_ref[:].T, preferred_element_type=jnp.float32)
        if n_items % nbi != 0:
            @pl.when(c == n_blocks - 1)
            def _():
                col = jax.lax.broadcasted_iota(jnp.int32, (b, nbi), 1) + c * nbi
                out_ref[:] = cmax(jnp.where(col < n_items, scores, NEG_INF))

            @pl.when(c < n_blocks - 1)
            def _():
                out_ref[:] = cmax(scores)
        else:
            out_ref[:] = cmax(scores)

    return kernel


def _rescore_kernel(m: int, r_pad: int, chunk: int):
    """Per grid step (i, j): score m selected chunks of query i. Each slot's
    [chunk, d] item block arrives via its own dynamic index_map (Mosaic
    pipelines the m DMAs across steps); the dot_general contracts both lane
    dims (RHS-transposed form — no in-kernel transpose)."""

    def kernel(sel_ref, *refs):
        del sel_ref  # consumed by the index maps
        item_refs, q_ref, out_ref = refs[:m], refs[m], refs[m + 1]
        i = pl.program_id(0)
        j = pl.program_id(1)
        # row i via one-hot contraction (dynamic sublane loads need 8-alignment)
        b = q_ref.shape[0]
        oh = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) == i, 1.0, 0.0)
        q_row = jnp.dot(oh, q_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)  # [1, D]
        for t in range(m):
            sc = jax.lax.dot_general(
                q_row, item_refs[t][:].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [1, chunk]
            out_ref[0, j * m + t, :] = sc[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("r_pad", "m", "chunk"))
def _rescore_call(items_p, queries, chunk_id_pad, r_pad, m, chunk):
    """chunk_id_pad: [B, r_pad] int32 ids into items_p's chunk grid (clamped
    in-range). Returns [B, r_pad, chunk] f32 exact scores."""
    b, d = queries.shape
    n_steps = r_pad // m
    sel = chunk_id_pad.reshape(b * r_pad)

    def mk_item_spec(t):
        return pl.BlockSpec(
            (chunk, d), lambda i, j, s, t=t: (s[i * r_pad + j * m + t], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_steps),
        in_specs=[mk_item_spec(t) for t in range(m)]
        + [pl.BlockSpec((b, d), lambda i, j, s: (0, 0))],
        out_specs=pl.BlockSpec((1, r_pad, chunk), lambda i, j, s: (i, 0, 0)),
    )
    return pl.pallas_call(
        _rescore_kernel(m, r_pad, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, r_pad, chunk), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r_pad * chunk * d,
            bytes_accessed=b * r_pad * chunk * d * items_p.dtype.itemsize,
            transcendentals=0,
        ),
    )(sel, *([items_p] * m), queries)


@functools.partial(jax.jit, static_argnames=("k", "block_items", "mode", "chunk"))
def topk_mips_pallas(item_vecs: jax.Array, queries: jax.Array, k: int,
                     block_items: int = 0, mode: str = "exact", chunk: int = CHUNK):
    """Top-k inner-product search. item_vecs: [N, D]; queries: [B, D] (cast
    both to bfloat16 for 2x stream bandwidth when serving tolerates it).
    Returns (indices [B, k] int32, scores [B, k] f32) sorted descending;
    scores are exact f32 re-scores of the selected items. Rows with fewer
    than k real candidates get idx -1 / score -1e30 in the tail lanes.

    mode="exact" (default): top-(k + 8) chunks re-scored. The chunk
    selection uses truncated packed keys, so a true top-k item is lost only
    when MORE THAN 8 other chunk-maxima tie within the key truncation
    bucket (2^-11 relative when the chunk space fits 12-bit positions —
    it does at the 498k serving shape — else 2^-10) above its chunk's max;
    the phase-2 re-score then repairs rank exactly among survivors.
    mode="fast": margin 2 — a smaller rescore with the correspondingly
    weaker >2-way-bucket-tie bound, for latency-critical serving. Catalogs
    with heavy near-ties at the k-th score should keep "exact"."""
    n, d = item_vecs.shape
    b = queries.shape[0]
    if block_items == 0:
        # biggest block whose f32 score buffer + double-buffered item stream
        # fit VMEM (~16 MB): scores b*block*4 + 2 * block*d*itemsize
        block_items = 16384 if (b <= 64 and item_vecs.dtype.itemsize <= 2) else 8192
    block_items = max(chunk, (block_items // chunk) * chunk)
    g = block_items // chunk  # chunks per block (<= 128; out lanes pad to 128)
    assert g <= 128, "block_items/chunk must fit one 128-lane out block"
    # no host-side padding: boundary blocks read partially out of bounds
    # (Mosaic returns safely-readable garbage) and the kernel's NEG_INF
    # column mask covers it — padding by concatenation would copy the whole
    # catalog (~0.3 ms at the 498k serving shape) on EVERY call
    n_blocks = (n + block_items - 1) // block_items

    cm = pl.pallas_call(
        _chunkmax_kernel(block_items, b, n, chunk),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_items, d), lambda c: (c, 0)),
            pl.BlockSpec((b, d), lambda c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, 128), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * block_items * d * b,
            bytes_accessed=n * d * item_vecs.dtype.itemsize,
            transcendentals=0,
        ),
    )(item_vecs, queries)

    # phase 2: exact re-score of the top-(k + margin) chunks. cm is in the
    # padded [n_blocks, 128] lane layout: lane j of block c is chunk j of
    # block c when j < g, NEG_INF otherwise (a padding lane is only ever
    # selected when every real chunk already is — harmless extra candidates).
    # The re-score rides the Pallas rescore kernel: XLA's row gather of the
    # same slabs measured ~2.7 ms vs ~0.1 ms of DMA at the serving shape.
    margin = CHUNK_MARGIN if mode == "exact" else 2
    w = n_blocks * 128
    r = min(k + margin, w)
    m = min(r, 32)  # chunk-DMA slots per grid step (cap the in_spec count)
    r_pad = ((r + m - 1) // m) * m
    if r <= K_PAD and w + K_PAD <= POS_MASK + 1:
        # packed-key selection rounds, ~4x cheaper than lax.top_k here
        # (0.04 vs 0.18 ms at [64, 3968]). Key truncation displaces chunks
        # only within 2^-(23-pos_bits) relative — absorbed by the margin
        # like accumulation-order jitter; 12-bit positions (2^-11 buckets)
        # whenever the chunk space fits, 13 otherwise.
        pb = 12 if w + K_PAD <= (1 << 12) else POS_BITS
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        run_k, run_i = merge_topk_keys(
            jnp.full((b, K_PAD), INT_MIN, jnp.int32),
            jnp.zeros((b, K_PAD), jnp.int32),
            pack_keys(cm, lane, pb), jnp.int32(0), r, w, pb)
        sel, vsel = run_i[:, :r], unpack_value(run_k[:, :r], pb)
    else:
        vsel, sel = jax.lax.top_k(cm, r)  # [B, R] indices in padded lane space
    chunk_id = jnp.minimum((sel // 128) * g + (sel % 128), (n - 1) // chunk)
    real = vsel > NEG_INF / 2  # padding lanes only select when all real ones did
    if r_pad != r:
        chunk_id = jnp.pad(chunk_id, ((0, 0), (0, r_pad - r)))
        real = jnp.pad(real, ((0, 0), (0, r_pad - r)))
    scores = _rescore_call(item_vecs, queries, chunk_id, r_pad, m, chunk)
    item_idx = (chunk_id[:, :, None] * chunk
                + jnp.arange(chunk, dtype=jnp.int32)[None, None, :])  # [B, Rp, chunk]
    valid = real[:, :, None] & (item_idx < n)
    exact = jnp.where(valid, scores, NEG_INF).reshape(b, r_pad * chunk)
    v, pos = jax.lax.top_k(exact, k)  # exact order among survivors
    i = jnp.take_along_axis(item_idx.reshape(b, r_pad * chunk), pos, axis=1)
    i = jnp.where(v > NEG_INF / 2, i, -1)
    return i.astype(jnp.int32), v


def topk_mips_xla(item_vecs: jax.Array, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """XLA golden reference: full matmul + hierarchical top_k."""
    from plotpointe_tpu.graphs.knn import _hierarchical_topk

    scores = jnp.dot(queries, item_vecs.T, preferred_element_type=jnp.float32)
    v, i = _hierarchical_topk(scores, k)
    return i, v
