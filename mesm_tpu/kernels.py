"""Global kernel dispatch switches.

Fused Pallas attention (ops/attention_pallas.py) vs the XLA core, measured on
v5e IN-MODEL via jax.profiler traces (round 2; wall-clock micro-timing
through this environment's remote relay proved unreliable — traces only):

  site (eval step)                       XLA chain    v3 "batched" kernel
  DETR encoder self-attn 128x8x195x195   1.76 ms/step 1.05 ms kernels + 0.31 ms
                                                      layout copies + fusion
                                                      ripple -> NET LOSS
                                                      (busy 6.5 -> 7.3 ms/step)
  DETR encoder self-attn 16x8x601x601    1.91 ms/lyr  1.02 ms/lyr -> step busy
                                                      32.0 -> 23.1 ms (-28%)

Why the short-length loss persists across three kernel layouts (per-head,
all-heads, sample-tiled batched): head_dim 32 pads to 128 lanes (4x VMEM and
MXU waste), and the (B,L,E)->(B,H,L,hd) layout change XLA inserts around the
custom call costs ~0.3 ms — the HBM saved on a 195x195 logits tile doesn't
cover it. At 600+ the logits tensor is 9.5x larger and the kernel wins big.

Round-2 update — the v4 "packed" layout (ops/attention_pallas.py
_mha_kernel_packed) finally wins at the flagship geometry: operands stay in
the model-native (B, L, E) shape and the head split happens inside the
kernel, so XLA inserts no (B,H,L,hd) transposes around the custom call and
the layout pressure on neighbouring LayerNorm fusions disappears. Measured
in-model (traces/eval_co8_packed vs traces/eval_co8, bf16 128x8x195x195):
step busy 4.74 -> 4.37 ms/batch (-7.8%), with the slow transposed-layout LN
reductions dropping 0.93 -> 0.32 ms as a side effect.

Modes: "off" (always XLA), "on" (kernel for any shape above the minimum
lowering size), "auto" (default — kernel only where measured to win, see
use_pallas_attention). Kernels are an INFERENCE path: the dispatch in
models/attention.py routes through them only for deterministic calls
(pallas_call has no autodiff rule here; training keeps the XLA core).
"""
from __future__ import annotations

import contextlib
import contextvars

import jax

# Dispatch mode resolution: a context-local override (pallas_scope) wins over
# the process-wide default (set_pallas_attention). The override is a
# ContextVar so two sessions sharing one process (e.g. concurrent eval+train
# threads) can hold different modes without fighting over a module global;
# code that spawns worker threads and needs them to see the scoped mode must
# propagate the context (contextvars.copy_context().run), as
# evaluate.warm_eval_step does.
_DEFAULT_MODE: str = "auto"  # "auto" | "on" | "off"
_MODE_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "mesm_pallas_mode", default=None
)


def _normalize_mode(enabled) -> str:
    if enabled is None or enabled == "auto":
        return "auto"
    if enabled in (True, "on"):
        return "on"
    return "off"


@contextlib.contextmanager
def pallas_scope(enabled):
    """Context-local kernel-dispatch mode: True/'on', False/'off', None/'auto'.

    Overrides the process default for the current thread/context only."""
    token = _MODE_OVERRIDE.set(_normalize_mode(enabled))
    try:
        yield
    finally:
        _MODE_OVERRIDE.reset(token)

# fp32 tier (v3 "batched" variant): long geometries only — at L=195 fp32 the
# batched kernel loses to XLA (round-1 measurement, see module docstring)
AUTO_MIN_LEN = 512
AUTO_MIN_BATCH = 16
# bf16 tier (v4 "packed" variant): wins from the flagship L=195 upward
PACKED_MIN_LEN = 128
PACKED_MIN_BATCH = 8
# fused LayerNorm->Dense (ops/layer_pallas.py): only worth it when the
# normalized axis is wide enough that re-reading the input dominates (the
# 2818-wide raw video features; hidden-size 256 blocks stay on XLA)
LN_DENSE_MIN_D = 1024
# packed all-heads SHORT-KEY formulation (models/attention.py
# attention_core_shortkey): one dense matmul over block-diagonally packed
# keys replaces the bqhd,bkhd->bhqk einsum at the t2v/enhance sites
# (~195 q x ~17 k), killing the (B,H,L,hd) relayout churn there. Pure XLA
# (differentiable). Bounds: only short keys benefit (F = H*Lk lanes must
# stay small), queries long enough that the relayout being killed matters.
SHORTKEY_MAX_LK = 64
SHORTKEY_MIN_LQ = 64
SHORTKEY_MIN_B = 8
# packed all-heads SHORT-QUERY formulation (attention_core_shortquery):
# SS-recon (~3 q x 194 k) and decoder cross-attn (10 q x 195 k) sites
SHORTQUERY_MAX_LQ = 32
SHORTQUERY_MIN_LK = 64
# Packed formulations are EVAL-ONLY by default: they were tuned on the
# forward-only eval step, and the measured TACoS fp32 B=8 TRAIN step — where
# shortkey/shortquery are the ONLY auto-vs-off difference (the Pallas tiers
# need B >= 16 and LN-dense gates on deterministic) — ran 35.1 ms/step with
# them engaged vs 17.2 kernels-off (round-3 bench, 2x). The backward of the
# block-diagonal pack plus the full (B, Lq, H*Lk) f32 exp residuals costs
# far more than the forward relayout churn they remove. Flip these to
# re-measure on future hardware.
SHORTKEY_TRAIN = False
SHORTQUERY_TRAIN = False
# int8 FFN — MEASURED NEGATIVE on v5e, default OFF. Three formulations, all
# in-model traced at the flagship geometry (baseline FFN = 0.137 ms/site,
# simultaneously ~99% of the bf16 MXU roofline AND ~HBM roofline):
#   - XLA int8_dense per-matmul (ops/quant.py): busy 3.708 -> 4.267 (the
#     bf16 hidden tensor still round-trips HBM, quant ops add on top);
#   - fused Pallas kernel, f32 quant chain (ops/ffn_pallas.py): 0.137/site —
#     parity: the int8 MXU saving is exactly eaten by f32 VPU quant work on
#     the 25M-element hidden tile (trace r3_ffnk);
#   - same kernel, bf16 quant chain: 0.20/site (trace r3_ffnk5) — the f32
#     round hop + mixed-precision chain vectorizes worse, and Mosaic has no
#     bf16 roundeven/sign/i1-select lowering to avoid it.
# Conclusion: at hidden 256->1024 the FFN is already dual-roofline-bound and
# int8's MXU headroom cannot be banked. Kept in-tree (tested) for future
# hardware; flip via set_int8_ffn.
INT8_FFN: bool = False


# Dot-stats LayerNorm (models/layers.ln_dot_stats): compute LN mean/E[x^2]
# as MXU dot-products with a ones-vector instead of XLA reduces. Targets the
# six video-stream LN sites whose feature-axis convert_reduce runs strided
# (~81 GB/s) in the L-minor layout the packed formulations induce — 0.93
# ms/batch of the 3.66 busy total at the flagship geometry
# (traces/r3s_hoist2). MEASURED NEUTRAL (round-4 verdict): in-model A/B at
# the flagship bf16 co8 geometry reads 3.659 ms/batch control vs 3.661
# dot-stats (traces/r4_ctrl vs r4_lnstats, scripts/trace_batch_busy.py) —
# the MXU dot formulation costs exactly what the strided VPU reduce costs
# at (24832, 256). Default stays OFF; eval (deterministic) only — the train
# path never sees the L-minor layouts.
DOT_STATS_LN: bool = False
# engage only where the slow sites live: big row counts, narrow features
DOT_STATS_MIN_ROWS = 4096
DOT_STATS_MAX_D = 512


def set_dot_stats_ln(enabled: bool) -> None:
    global DOT_STATS_LN
    DOT_STATS_LN = bool(enabled)


def use_dot_stats_ln(n_rows: int, d: int) -> bool:
    mode = pallas_mode()
    if mode == "off" or not DOT_STATS_LN:
        return False
    in_range = n_rows >= DOT_STATS_MIN_ROWS and d <= DOT_STATS_MAX_D
    if mode == "on":
        return in_range
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and in_range


def set_int8_ffn(enabled: bool) -> None:
    global INT8_FFN
    INT8_FFN = bool(enabled)


def use_int8_ffn() -> bool:
    if pallas_mode() == "off":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return INT8_FFN and on_tpu


# softmax stage of the shortkey path: "reshape" = grouped softmax via a
# (B,Lq,H,Lk) view; "segmm" = segment sums via tiny matmuls, tensors stay
# (B,Lq,F); "kernel" = the v5 one-matmul Pallas kernel
# (attention_pallas.fused_attention_shortkey). All value-parity tested.
# Measured in-model on v5e (round 3, charades bf16 co8 traces r3_*):
#   control (no shortkey)  4.286 ms/batch busy
#   reshape                4.465  (f32 (B,Lq,H,Lk) grouped-softmax
#                                  intermediates materialize batch-minor)
#   segmm                  4.103  (-4.3% vs control) <- default
#   segmm + (F,F)-ones     4.213  (one-matmul sum+broadcast loses to the
#                                  two thin matmuls, trace r3_segmm2)
#   kernel (v5)            4.534  (0.12-0.15 ms/site vs ~0.11 XLA, and the
#                                  L-minor copies it aimed at turned out to
#                                  come from the SS-recon/decoder sites ->
#                                  see use_shortquery_packed)
SHORTKEY_VARIANT = "segmm"

# FLAT superbatch projection hoist — MEASURED NEGATIVE on v5e, default OFF.
# Keeping the hoisted dedup projection + sine positions 2-D (R, d) as
# scan-loop invariants (in-body row gather with a global slot) removes the
# 4-D sublane-retiling copies outside the scan (outside 0.264 -> 0.241
# ms/batch) but the in-body flat gather costs far more than it saves:
# scan-body busy 3.054 -> 3.364 ms/batch, bench 37,329 -> 34,898 rows/s
# (traces/r4_k32_pos vs r4_k32_flat, 2026-08-19). Kept in-tree (value-parity
# tested via tests/test_coalesce.py::test_flat_hoist_matches_group_form) for
# future hardware where gathers are cheaper relative to retiles.
FLAT_HOIST: bool = False

# Unroll factor for the coalesced eval scan (parallel/step.py multi_sb/multi).
# unroll=N emits N consecutive scan bodies per loop iteration, letting XLA
# software-pipeline HBM-bound fusions of iteration i against MXU-bound
# matmuls of iteration i+1 (and halving loop bookkeeping). Read at trace
# time. K need NOT divide evenly by the factor (lax.scan unrolls the
# remainder iterations separately — pinned by tests/test_coalesce.py::
# test_scan_unroll_matches_default at K=3, unroll=2); divisibility only
# affects how cleanly the software pipeline overlaps.
#
# MEASURED NEGATIVE on v5e (scripts/probe_unroll.py --factors 1 2 4,
# 2026-08-19, K=32 flagship geometry, outputs bit-identical across factors):
# unroll=1 34,210 rows/s > unroll=2 33,572 (-1.9%) > unroll=4 32,524
# (-4.9%), monotonic. The pipelining hypothesis fails here: the scan body is
# already a deep op pipeline XLA overlaps internally, and unrolling only
# grows program size. Default stays 1; kept in-tree + parity-tested for
# geometries with thinner bodies.
EVAL_SCAN_UNROLL: int = 1

# jax.checkpoint (remat) around the TRAINING attention core at the big
# quadratic self-attention sites. Hypothesis (round-5 train ledger,
# traces/r5_train_fp32): the fp32 attention chain is 5.62 ms of the 24.92
# ms busy step, and its backward reloads the saved (64,8,195,195) f32
# probability/logits tensors from HBM (78 MB each). Remat recomputes the
# logits->softmax(->dropout-mask) chain in the backward instead — ~1.6
# GFLOP of MXU recompute (~0.02 ms) against the saved HBM round-trips.
# Gated to min(Lq, Lk) >= ATTN_REMAT_MIN_L so only the quadratic sites pay
# the recompute (the short-key/short-query train sites have kB-scale
# logits). Dispatch: models/attention.dispatch_attention_core; value
# parity: tests/test_attention.py::test_attn_remat_matches_plain.
#
# MEASURED NEGATIVE on v5e (scripts/probe_train_remat.py, 2026-08-20, B=32
# fp32 rbg, 3 interleaved rounds, losses equal): plain 15.78 ms/step <
# remat 16.83 (-6.2%). The hypothesis fails the same way the eval
# megakernel did: XLA's forward-saved schedule already overlaps the probs
# round-trip against the backward matmul pipeline, and the rematerialized
# logits chain re-pays the softmax VPU work without freeing any bandwidth
# the scheduler was actually starved of. Default stays off; kept in-tree +
# grad-parity-tested for geometries with longer L where the saved tensors
# stop fitting the overlap window.
ATTN_REMAT: bool = False
ATTN_REMAT_MIN_L: int = 128


def use_attn_remat(Lq: int, Lk: int, deterministic: bool = True) -> bool:
    """Dispatch for the remat'd training attention core. Backend-agnostic:
    this is an XLA scheduling hint (recompute-in-backward), not a TPU
    kernel, so no on_tpu gate."""
    if deterministic or not ATTN_REMAT:
        return False
    return Lq >= ATTN_REMAT_MIN_L and Lk >= ATTN_REMAT_MIN_L


def use_fused_ln_dense(D: int) -> bool:
    """Dispatch for the fused LayerNorm->Dense input-projection kernel."""
    mode = pallas_mode()
    if mode == "off":
        return False
    if mode == "on":
        return True
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and D >= LN_DENSE_MIN_D


def set_pallas_attention(enabled) -> None:
    """Set the PROCESS-WIDE default mode: True/'on', False/'off', None/'auto'.

    For per-session isolation inside one process use pallas_scope instead."""
    global _DEFAULT_MODE
    _DEFAULT_MODE = _normalize_mode(enabled)


def pallas_mode() -> str:
    override = _MODE_OVERRIDE.get()
    return override if override is not None else _DEFAULT_MODE


def use_shortkey_packed(
    B: int = 0, Lq: int = 0, Lk: int = 0, dtype=None, deterministic: bool = True
) -> bool:
    """Dispatch for the packed all-heads short-key attention formulation
    (models/attention.attention_core_shortkey). Rides the same mode switch
    as the Pallas kernels so 'off' still means the reference-shaped XLA
    chain everywhere (the metric-parity lever). Never overlaps
    use_pallas_attention: that tier needs min(Lq, Lk) >= 128. Training
    (deterministic=False) keeps the XLA chain unless SHORTKEY_TRAIN — see
    the measured 2x train regression at the constant's definition."""
    mode = pallas_mode()
    if mode == "off":
        return False
    if not deterministic and not SHORTKEY_TRAIN:
        return False
    in_range = Lk <= SHORTKEY_MAX_LK and Lq >= SHORTKEY_MIN_LQ and B >= SHORTKEY_MIN_B
    if mode == "on":
        return in_range
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and in_range


def use_shortquery_packed(
    B: int = 0, Lq: int = 0, Lk: int = 0, dtype=None, deterministic: bool = True
) -> bool:
    """Dispatch for the packed all-heads short-QUERY formulation
    (models/attention.attention_core_shortquery): SS-recon cross-attn
    (~3 q x 194 k) and decoder cross-attn (10 q x 195 k). Head-splitting
    the LONG key/value there flips the video stream into L-minor layouts
    (~0.45 ms/batch of copies, traces/r3_segmm); packing the tiny query
    keeps k/v untouched. Never overlaps the other tiers: Pallas needs
    min(Lq, Lk) >= 128, shortkey needs Lq >= 64. Training keeps the XLA
    chain unless SHORTQUERY_TRAIN (see SHORTKEY_TRAIN note)."""
    mode = pallas_mode()
    if mode == "off":
        return False
    if not deterministic and not SHORTQUERY_TRAIN:
        return False
    in_range = (
        Lq <= SHORTQUERY_MAX_LQ and Lk >= SHORTQUERY_MIN_LK and B >= SHORTKEY_MIN_B
    )
    if mode == "on":
        return in_range
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    return on_tpu and in_range


def use_pallas_attention(B: int = 0, Lq: int = 0, Lk: int = 0, dtype=None) -> bool:
    """Shape- and dtype-aware dispatch decision for the current mode.

    Two measured tiers (both on v5e, in-model traces):
    - fp32 -> v3 "batched" variant, only for long geometries (TACoS
      16x8x601x601: step busy 32.0 -> 23.1 ms; at L=195 fp32 it loses).
      bf16 halves the XLA chain's logits traffic, erasing the batched
      variant's win (19.9 XLA vs 20.4 kernel at 601 bf16).
    - bf16 -> v4 "packed" variant from L >= 128 (charades 128x8x195x195:
      step busy 4.74 -> 4.37 ms/batch; layout churn removed).
    The variant itself is selected by dtype in attention_pallas.fused_attention.

    Numerics note: for bf16 the packed kernel's softmax exp/divide run in
    bf16 (_softmax_lastdim; f32 denominator sum), while the XLA chain it
    replaces upcasts its bf16-stored logits to f32 for the whole softmax
    (models/attention.py). The measured gate for this difference is METRIC
    parity, not elementwise parity: a full synthetic eval epoch kernels-off
    vs auto matches all 11 metric brief keys to 0.000 on v5e
    (scripts/tpu_check.py regenerates TPU_PARITY.json each round)."""
    mode = pallas_mode()
    if mode == "off":
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        on_tpu = False
    if mode == "on":
        return True
    if not on_tpu:
        return False
    import jax.numpy as jnp

    if dtype == jnp.bfloat16:
        # both sides long. The short-key t2v/enhance sites (195 q x 17 k)
        # resisted THREE kernel attempts, all measured in-model: straight
        # packed layout busy 4.37 -> 5.04 ms/batch (17 keys lane-pad to 128);
        # transposed-logits shortkey variant 4.30 -> 4.45 (0.16 ms/site vs
        # ~0.11 XLA — per-head lane slices of the long query dominate at
        # tiny key counts). The shortkey kernel stays in the tree (tested,
        # attention_pallas._mha_kernel_packed_shortkey) but auto keeps XLA
        # for any Lk < PACKED_MIN_LEN.
        return min(Lq, Lk) >= PACKED_MIN_LEN and B >= PACKED_MIN_BATCH
    return min(Lq, Lk) >= AUTO_MIN_LEN and B >= AUTO_MIN_BATCH
