"""Jitted train / eval steps: forward + criterion + optimizer in one XLA program.

This is the TPU-native replacement for the reference's per-step Python loop
(train.py:42-96: forward, criterion with a host-synced scipy matcher, backward,
clip, step as separate host-driven calls). Here a single compiled program does
text encode -> negative sampling -> model forward (pos+neg passes) -> matcher
-> losses -> grad -> global-norm clip -> AdamW update, with batch rows sharded
over the `data` mesh axis and XLA inserting the gradient all-reduce.

Optimizer parity: AdamW(lr, wd=1e-4, betas=(0.9,0.999), eps=1e-8) +
clip_grad_norm_(0.1) (reference runner.py:348-352, train.py:70-72). The
StepLR epoch schedule is applied by the host driver via set_learning_rate
(torch steps the scheduler per epoch, train.py:149).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import CriterionConfig, compute_losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def build_optimizer(
    lr: float, weight_decay: float = 1e-4, grad_clip: float = 0.1
) -> optax.GradientTransformation:
    clip = optax.clip_by_global_norm(grad_clip) if grad_clip > 0 else optax.identity()
    return optax.chain(
        clip,
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        ),
    )


def current_learning_rate(state: TrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    inner = state.opt_state[1]
    hyper = dict(inner.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    inner = inner._replace(hyperparams=hyper)
    return state.replace(opt_state=(state.opt_state[0], inner))


def sample_out_of_group(
    rng: jax.Array, group_id: jnp.ndarray, row_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Uniformly pick, for each row, another VALID row from a different group.

    Reference sample_outclass_neg (utils/data_utils.py:113-124) does this on
    host with randperm; the Gumbel-argmax below is the same uniform draw.
    Rows with no candidates fall back to (i+1) % B (the reference would crash;
    its sampler guarantees >= 2 groups per batch, ours does too)."""
    B = group_id.shape[0]
    cand = group_id[None, :] != group_id[:, None]
    if row_mask is not None:
        cand = cand & (row_mask[None, :] > 0)
    g = jax.random.gumbel(rng, (B, B))
    idx = jnp.argmax(jnp.where(cand, g, -jnp.inf), axis=1).astype(jnp.int32)
    fallback = (jnp.arange(B, dtype=jnp.int32) + 1) % B
    return jnp.where(cand.any(axis=1), idx, fallback)


# encode_text_fn: (frozen_params, batch) ->
#     (words_feat, words_mask, sentence_feat)  [all truncated to max_words_l]
EncodeTextFn = Callable[[dict, Dict[str, jnp.ndarray]], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


def _model_kwargs(batch, dedup_video: bool = False):
    kw = dict(
        clip_mask=batch.get("clip_mask"),
        words_weight=batch.get("words_weight"),
        unknown_mask=batch.get("unknown_mask"),
        ss_sent_idx=batch.get("ss_sent_idx"),
        ss_sent_mask=batch.get("ss_sent_mask"),
        ss_own_pos=batch.get("ss_own_pos"),
        ss_video_feat=batch.get("ss_video_feat"),
        ss_video_mask=batch.get("ss_video_mask"),
    )
    if dedup_video:
        # eval-only: at train the per-row projection keeps independent
        # dropout draws per sentence row, like the reference
        kw.update(
            video_feat_g=batch.get("video_feat_g"),
            video_mask_g=batch.get("video_mask_g"),
            video_slot=batch.get("video_slot"),
            video_proj_g=batch.get("video_proj_g"),
            vid_pos_g=batch.get("vid_pos_g"),
            video_proj_rows=batch.get("video_proj_rows"),
            vid_pos_rows=batch.get("vid_pos_rows"),
        )
    return kw


def make_micro_grads(model, ccfg: CriterionConfig, encode_text_fn: EncodeTextFn):
    """(params, frozen_text, batch, rng3) -> ((total, losses), grads) for ONE
    batch. rng3 = (dropout, mask_words, neg_sampling) keys, in the split
    order the single-step path has always used. Shared by the plain and the
    gradient-accumulating train steps (and importable by tests as the
    grad oracle for the scan path)."""

    def micro_grads(params, frozen_text, batch, rng3):
        rng_drop, rng_mask, rng_neg = rng3
        words_feat, words_mask, sentence_feat = encode_text_fn(frozen_text, batch)
        neg_rows = sample_out_of_group(rng_neg, batch["group_id"], batch.get("row_mask"))

        def loss_fn(p):
            out = model.apply(
                {"params": p},
                batch["video_feat"],
                batch["video_mask"],
                words_feat,
                words_mask,
                sentence_feat,
                neg_rows,
                is_training=True,
                deterministic=False,
                rngs={"dropout": rng_drop, "mask_words": rng_mask},
                **_model_kwargs(batch),
            )
            losses, total = compute_losses(out, batch, ccfg, is_training=True)
            return total, losses

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    return micro_grads


def make_train_step(
    model, ccfg: CriterionConfig, encode_text_fn: EncodeTextFn, tx,
    grad_accum: int = 1,
):
    """Returns jitted train_step(state, frozen_text, batch, rng) -> (state, metrics).

    grad_accum=k > 1 turns the step into a microbatched one: the batch's
    leading axis B is reshaped to (k, B//k) and scanned with `lax.scan`, so
    activation memory is bounded by ONE microbatch while the optimizer sees
    the mean of the k microbatch gradients in a single update. This is the
    TPU-native large-effective-batch mode (the reference has no analog; it
    is bounded by what one GPU forward fits). Semantics of record:

      update = tx.update(mean_i grad(loss(microbatch_i)))

    i.e. negative sampling, Hungarian matching, and loss normalization are
    all PER MICROBATCH — each microbatch behaves exactly like one reference
    batch, and the update equals averaging k independent single-step
    gradients from the same parameters. Gradients accumulate in fp32
    regardless of compute dtype. Per-microbatch randomness is
    split3(fold_in(fold_in(rng, state.step), i)). Requires every batch
    leaf's leading axis divisible by k (the group-aware sampler keeps >= 2
    groups per row-capacity slice, so in-microbatch negatives stay valid).
    """
    micro_grads = make_micro_grads(model, ccfg, encode_text_fn)

    def apply_update(state, grads, total, losses):
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss_overall"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, metrics

    if grad_accum <= 1:
        def train_step(state: TrainState, frozen_text, batch, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            rng3 = jax.random.split(step_rng, 3)
            (total, losses), grads = micro_grads(
                state.params, frozen_text, batch, rng3
            )
            return apply_update(state, grads, total, losses)

        return jax.jit(train_step, donate_argnums=(0,))

    k = int(grad_accum)

    def train_step(state: TrainState, frozen_text, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def split_micro(x):
            if x.shape[0] % k != 0:
                raise ValueError(
                    f"grad_accum={k} needs batch leading axis divisible by "
                    f"{k}, got shape {x.shape}"
                )
            return x.reshape((k, x.shape[0] // k) + x.shape[1:])

        micro = jax.tree.map(split_micro, batch)
        acc0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )

        def body(acc, xs):
            mb, i = xs
            rng3 = jax.random.split(jax.random.fold_in(step_rng, i), 3)
            (total, losses), g = micro_grads(state.params, frozen_text, mb, rng3)
            acc = jax.tree.map(
                lambda a, gi: a + gi.astype(jnp.float32), acc, g
            )
            # per-microbatch scalars are scanned OUT (k of each) and averaged
            # below — only the fp32 grad accumulator rides the carry
            return acc, (total.astype(jnp.float32), losses)

        acc, (totals, losses_stacked) = jax.lax.scan(
            body, acc0, (micro, jnp.arange(k))
        )
        grads = jax.tree.map(
            lambda a, p: (a / k).astype(p.dtype), acc, state.params
        )
        total = totals.mean()
        losses = jax.tree.map(
            lambda v: v.astype(jnp.float32).mean(axis=0), losses_stacked
        )
        return apply_update(state, grads, total, losses)

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(
    model,
    ccfg: Optional[CriterionConfig],
    encode_text_fn: EncodeTextFn,
    with_loss: bool,
    coalesce: int = 1,
    params_unravel=None,
    superbatch: bool = False,
):
    """Returns jitted eval_step(params, frozen_text, batch, rng) -> preds[, losses].

    Predictions stay on device as fixed-shape arrays; the host pulls one
    consolidated transfer per batch (vs the reference's per-tensor
    .cpu().tolist() in eval.py:64-98).

    coalesce=K > 1 returns a DISPATCH-COALESCED step instead: it takes a tuple
    of K same-shape batch dicts and runs all K through one compiled program
    (device-side stack + lax.scan over the leading axis), returning stacked
    preds/losses with leading axis K. One host->device dispatch then covers K
    batches — on hosts where each dispatch pays fixed latency (this
    environment's remote relay: ~1.4 ms/call) that overhead is divided by K.
    Values are identical to K per-batch calls (same rng per batch, as
    compute_mr_results already passes). The returned callable carries a
    `.coalesce` attribute so the eval driver knows the expected arity.

    superbatch=True (with coalesce=K > 1) takes the K batches PRE-STACKED:
    one dict whose leaves carry a leading K axis (data/pipeline.py
    stage_superbatch builds it host-side with one np.stack + one transfer
    per field). Two wins over the tuple form on dispatch-overhead-bound
    hosts: ~15 argument handles per dispatch instead of K*15, and the
    in-program jnp.stack of K batches disappears (measured 0.18 ms/batch
    of device time at the charades flagship geometry). Values are identical
    to the tuple form — same scanned program after the stack.

    params_unravel (from jax.flatten_util.ravel_pytree): when given, the
    step takes the RAVELED 1-D parameter vector instead of the pytree and
    unravels it in-program. On hosts where dispatch cost scales with the
    argument-handle count (this environment's remote relay: ~190 param
    leaves per call), one flat buffer replaces ~190 handles per dispatch;
    the in-program unravel is a few dynamic slices over HBM.
    """

    def eval_step(params, frozen_text, batch, rng):
        words_feat, words_mask, sentence_feat = encode_text_fn(frozen_text, batch)
        if with_loss:
            neg_rows = sample_out_of_group(
                jax.random.fold_in(rng, 0), batch["group_id"], batch.get("row_mask")
            )
        else:
            # the negative pass is off (compute_neg=with_loss below): the
            # model never reads these indices, so don't trace the (B, B)
            # Gumbel argmax at all (XLA would DCE it, but the trace and the
            # jaxpr stay honest this way)
            neg_rows = jnp.zeros(batch["group_id"].shape, jnp.int32)
        out = model.apply(
            {"params": params},
            batch.get("video_feat"),  # None on the deduplicated-video path
            batch["video_mask"],
            words_feat,
            words_mask,
            sentence_feat,
            neg_rows,
            is_training=False,
            deterministic=True,
            compute_neg=with_loss,  # negatives only feed the eval loss
            **_model_kwargs(batch, dedup_video=True),
        )
        prob = jax.nn.softmax(out["pred_logits"], axis=-1)
        sal = out["saliency_scores"]
        if jnp.dtype(getattr(model.cfg, "dtype", jnp.float32)) == jnp.bfloat16:
            # bf16-compute eval: the saliency dot is a bf16 product chain whose
            # final f32 promotion comes only from the 1/sqrt(d) scale — ship it
            # back at bf16 and halve the dominant result-transfer field
            # ((K,B,Lv) f32 = 3.2 MB/superbatch at the flagship geometry; the
            # whole rest of the pull is ~0.2 MB). Decode upcasts to f32.
            # Metric parity is gated by test_bf16_eval_metric_parity.
            sal = sal.astype(jnp.bfloat16)
        preds = {
            "scores": prob[..., 0],  # foreground prob (class 0)
            "pred_spans": out["pred_spans"],
            "saliency_scores": sal,
        }
        if with_loss and ccfg is not None:
            losses, total = compute_losses(out, batch, ccfg, is_training=False)
            losses = dict(losses)
            losses["loss_overall"] = total
            return preds, losses
        return preds, {}

    def _params(p):
        return params_unravel(p) if params_unravel is not None else p

    def _hoist_video_proj(p, stacked):
        """Project the unique-video features for ALL K batches in one batched
        call BEFORE the scan (MESM.project_video_groups). The wide (K, NG, Lv,
        v_feat_dim) stack is then consumed by one large kernel instead of a
        per-k dynamic-slice + relayout copy inside the scan body; the
        video_slot row-gather stays in the body. Measured at the charades
        flagship geometry (traces r3s_ctrl/hoist/hoist2/anchor, device-busy
        ms/batch incl. outside-scan ops): control 3.84, THIS group-hoist
        3.66, rows-hoist (gather outside too) 3.76, rows-hoist + row-major
        Pallas layout anchor 3.89. The body's L-major layout flip this
        induces costs 0.65 in LN-stat reductions but saves ~0.9 of stream
        fusions/copies — net the un-anchored group form wins. Values are
        identical — the projection is deterministic at eval."""
        vfr = stacked.get("video_feat_rows")
        if vfr is not None:
            # 2-D row-major-pinned staging (data/pipeline.stage_superbatch):
            # the wide rows feed the fused LN->Dense with no entry relayout
            # copy; only the narrow (rows, d) output reshapes to (K, NG, Lv,
            # d) in-program (~42 MB vs the 463 MB copy this removes).
            #
            # MEASURED NEGATIVE (round 4, kept in-tree behind FLAT_HOIST):
            # keeping the projection/pos FLAT 2-D as scan-loop invariants and
            # row-gathering them in the body with a global slot removes the
            # 4-D retiling copies outside the scan (0.264 -> 0.241 ms/batch)
            # but the in-body flat gather costs far more than it saves:
            # scan-body busy 3.054 -> 3.364, bench 37,329 -> 34,898 rows/s
            # (traces/r4_k32_pos vs r4_k32_flat). Value parity of both forms
            # is pinned by tests/test_coalesce.py.
            from mesm_tpu import kernels as _k

            vm = stacked["video_mask_g"]  # (K, NG, Lv)
            K, NG, Lv = vm.shape
            if _k.FLAT_HOIST:
                proj, pos = model.apply(
                    {"params": p},
                    vfr,
                    vm.reshape(K * NG, Lv),
                    method="project_video_rows_flat",
                )
                stacked = dict(stacked)
                del stacked["video_feat_rows"]
                del stacked["video_mask_g"]  # only the hoist consumed it
                # staged under a distinct key (stage_superbatch) so a
                # flag-state mismatch between staging and tracing raises
                # here instead of silently gathering wrong rows
                stacked["video_slot"] = stacked.pop("video_slot_flat")
                invariant = {
                    "video_proj_rows": proj,
                    "vid_pos_rows": pos.astype(proj.dtype),
                }
                return stacked, invariant
            assert "video_slot_flat" not in stacked, (
                "superbatch was staged with kernels.FLAT_HOIST on (global "
                "slots) but this step was built with it off — re-stage or "
                "rebuild with a consistent flag"
            )
            proj, pos = model.apply(
                {"params": p},
                vfr,
                vm.reshape(K * NG, Lv),
                method="project_video_rows",
            )
            stacked = dict(stacked)
            del stacked["video_feat_rows"]
            stacked["video_proj_g"] = proj.reshape(K, NG, Lv, proj.shape[-1])
            stacked["vid_pos_g"] = pos.astype(proj.dtype).reshape(
                (K, NG) + pos.shape[1:]
            )
            return stacked, {}
        vf = stacked.get("video_feat_g")
        if vf is None:
            return stacked, {}
        K, NG = vf.shape[:2]
        vm = stacked["video_mask_g"]
        proj, pos = model.apply(
            {"params": p},
            vf.reshape((K * NG,) + vf.shape[2:]),
            vm.reshape((K * NG,) + vm.shape[2:]),
            method="project_video_groups",
        )
        stacked = dict(stacked)
        del stacked["video_feat_g"]
        stacked["video_proj_g"] = proj.reshape((K, NG) + proj.shape[1:])
        stacked["vid_pos_g"] = pos.astype(proj.dtype).reshape((K, NG) + pos.shape[1:])
        return stacked, {}

    def _scan_batches(body, stacked):
        """lax.map over the leading K axis, with optional unroll
        (kernels.EVAL_SCAN_UNROLL, read at trace time): unroll=N emits N
        consecutive bodies per loop iteration so XLA can software-pipeline
        them. Values are identical — same body, same order."""
        from mesm_tpu import kernels as _k

        unroll = max(1, int(getattr(_k, "EVAL_SCAN_UNROLL", 1)))
        if unroll <= 1:
            return jax.lax.map(body, stacked)
        _, ys = jax.lax.scan(
            lambda carry, b: (carry, body(b)), None, stacked, unroll=unroll
        )
        return ys

    if coalesce <= 1:
        @jax.jit
        def jitted(params, frozen_text, batch, rng):
            return eval_step(_params(params), frozen_text, batch, rng)

        def fn(params, frozen_text, batch, rng):
            return jitted(params, frozen_text, batch, rng)

        fn._jitted = jitted
    elif superbatch:
        @jax.jit
        def multi_sb(params, frozen_text, stacked, rng):
            p = _params(params)  # unravel once, outside the scan body
            stacked, invariant = _hoist_video_proj(p, stacked)
            return _scan_batches(
                lambda b: eval_step(p, frozen_text, {**b, **invariant}, rng),
                stacked,
            )

        def fn(params, frozen_text, stacked, rng):
            # `video_feat_rows` is staged 2-D as (K*NG*Lv, Dv) by design
            # (data/pipeline.stage_superbatch row-major pin) — validate it
            # against the mask shape instead of the per-field K axis.
            lead = {
                k: v.shape[0]
                for k, v in stacked.items()
                if k != "video_feat_rows"
            }
            assert set(lead.values()) == {coalesce}, (
                f"superbatch eval step expects leading axis {coalesce}, got {lead}"
            )
            vfr = stacked.get("video_feat_rows")
            if vfr is not None:
                K, NG, Lv = stacked["video_mask_g"].shape
                assert vfr.shape[0] == K * NG * Lv, (
                    f"video_feat_rows expects {K}*{NG}*{Lv}={K * NG * Lv} rows, "
                    f"got {vfr.shape[0]}"
                )
            return multi_sb(params, frozen_text, stacked, rng)

        fn._jitted = multi_sb
    else:
        @jax.jit
        def multi(params, frozen_text, batches, rng):
            p = _params(params)  # unravel once, outside the scan body
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
            stacked, invariant = _hoist_video_proj(p, stacked)
            return _scan_batches(
                lambda b: eval_step(p, frozen_text, {**b, **invariant}, rng),
                stacked,
            )

        def fn(params, frozen_text, batches, rng):
            assert len(batches) == coalesce, (
                f"coalesced eval step expects {coalesce} batches, got {len(batches)}"
            )
            return multi(params, frozen_text, tuple(batches), rng)

        fn._jitted = multi

    fn.coalesce = max(1, coalesce)
    fn.superbatch = superbatch and coalesce > 1
    fn.packs_params = params_unravel is not None
    return fn

