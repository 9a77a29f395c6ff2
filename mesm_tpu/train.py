"""Training driver.

Parity target: reference train.py (set_seed :32, train_epoch :42, train :99):
epoch loop, per-epoch eval over val splits, best-checkpoint tracking keyed on
MR-full-{stop_score}, early stop after max_es_cnt, latest/periodic checkpoint
families, TensorBoard + append-only text logs, and the four step-time meters.

TPU-native differences: one jitted train step fuses forward+criterion+AdamW
(forward/backward are not separable timers; model_backward_time is reported
as 0), the frozen text encoder lives outside the trainable params, and
batches are fixed-shape row-budget packs.
"""
from __future__ import annotations

import json
import logging
import os
import pprint
import random
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels
from . import runner as R
from .config import BaseOptions
from .evaluate import eval_epoch
from .parallel import (
    TrainState,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from .parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from .utils import AverageMeter, count_parameters, dict_to_markdown, load_checkpoint, save_checkpoint

logger = logging.getLogger(__name__)
logging.basicConfig(
    format="%(asctime)s.%(msecs)03d:%(levelname)s:%(name)s - %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=logging.INFO,
)

TRAIN_LOG_FMT = "{time_str} [Epoch] {epoch:03d} [Loss] {loss_str}\n"
EVAL_LOG_FMT = (
    "{time_str} [Epoch] {epoch:03d} [Split] {split} [Loss] {loss_str} "
    "[Metrics] {eval_metrics_str}\n"
)


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


# --- graceful preemption ----------------------------------------------------
# TPU VMs are routinely preempted with a SIGTERM + grace window. The reference
# has no analog (recovery is manual --resume); here SIGTERM finishes the
# in-flight step, saves model_latest.ckpt with the last COMPLETED epoch, and
# returns cleanly, so `--resume_all model_latest.ckpt` restarts at most one
# epoch back. Installed by train() in the main thread; no-op elsewhere.
_PREEMPT = __import__("threading").Event()


def _install_preempt_handler():
    """Install the SIGTERM->checkpoint handler; returns a restore() callable.

    train() MUST restore the previous disposition on exit: a leaked handler
    makes the whole process TERM-immune afterward (observed: a `timeout`-
    bounded test run absorbing its own kill signal and wedging for hours)."""
    import signal

    def _handler(signum, frame):
        logger.warning(
            f"received signal {signum}: finishing the in-flight step, then "
            "checkpointing model_latest.ckpt and exiting"
        )
        _PREEMPT.set()

    try:
        prev = signal.signal(signal.SIGTERM, _handler)
    except ValueError:
        # not the main thread (e.g. train() driven from a test harness
        # worker) — preemption saving is then the caller's concern
        logger.info("not in main thread; SIGTERM checkpointing disabled")
        return lambda: None

    def restore():
        try:
            signal.signal(signal.SIGTERM, prev)
        except (ValueError, TypeError):
            pass

    return restore


def _device_batch(batch, sharding=None):
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    if "ss_video_feat_groups" in jb:
        jb["ss_video_feat"] = jb.pop("ss_video_feat_groups")[jb["ss_group_slot"]]
        jb["ss_video_mask"] = jb.pop("ss_video_mask_groups")[jb["ss_group_slot"]]
        del jb["ss_group_slot"]
    if sharding is not None:
        jb = {k: jax.device_put(v, sharding) for k, v in jb.items()}
    return jb


def train_epoch(train_step, state, frozen, train_loader, rng, opt, epoch_i, tb_writer, sharding):
    time_meters = defaultdict(AverageMeter)
    loss_meters = defaultdict(AverageMeter)
    weight_map = _weight_map(opt)

    timer_data = time.time()
    for batch, meta in train_loader:
        time_meters["dataloading_time"].update(time.time() - timer_data)
        t0 = time.time()
        jb = _device_batch(batch, sharding)
        time_meters["prepare_inputs_time"].update(time.time() - t0)
        t0 = time.time()
        state, metrics = train_step(state, frozen, jb, rng)
        metrics = jax.device_get(metrics)
        time_meters["model_forward_time"].update(time.time() - t0)
        time_meters["model_backward_time"].update(0.0)  # fused into the step
        for k, v in metrics.items():
            loss_meters[k].update(float(v) * weight_map.get(k, 1.0))
        timer_data = time.time()
        if _PREEMPT.is_set():
            break  # train() checkpoints and exits

    if tb_writer is not None:
        from .parallel.step import current_learning_rate

        tb_writer.add_scalar("Train/lr", current_learning_rate(state), epoch_i + 1)
        for k, v in loss_meters.items():
            tb_writer.add_scalar(f"Train/{k}", v.avg, epoch_i + 1)

    with open(opt.train_log_filepath, "a") as f:
        f.write(
            TRAIN_LOG_FMT.format(
                time_str=time.strftime("%Y_%m_%d_%H_%M_%S"),
                epoch=epoch_i + 1,
                loss_str=" ".join(f"{k} {v.avg:.4f}" for k, v in loss_meters.items()),
            )
        )
    logger.info("Epoch time stats:")
    for name, meter in time_meters.items():
        d = {k: f"{getattr(meter, k):.4f}" for k in ["max", "min", "avg"]}
        logger.info(f"{name} ==> {d}")
    return state, loss_meters


def _weight_map(opt):
    w = {
        "loss_span": opt.loss_span_coef,
        "loss_giou": opt.loss_giou_coef,
        "loss_label": opt.loss_label_coef,
        "loss_saliency": opt.loss_saliency_coef,
        "loss_rec_fw": opt.loss_recfw_coef,
        "loss_rec_ss": opt.loss_recss_coef,
    }
    if opt.aux_loss:
        for i in range(opt.dec_layers - 1):
            for k in ["loss_span", "loss_giou", "loss_label"]:
                w[f"{k}_{i}"] = w[k]
    return w


def train(args=None):
    opt = BaseOptions().parse(args)
    set_seed(opt.seed)
    _PREEMPT.clear()
    restore_sigterm = _install_preempt_handler()
    try:
        # config-scoped kernel dispatch (see kernels.pallas_scope): a
        # concurrent eval session in this process keeps its own mode
        with kernels.pallas_scope(opt.pallas_attention):
            return _train_body(opt)
    finally:
        restore_sigterm()


def _train_body(opt):
    compute_dtype = R.compute_dtype_from_opt(opt)
    vocab = R.get_vocab(opt)
    train_loader, train_spec, val_loaders, _ = R.build_loaders(opt, vocab)
    model = R.build_model(opt, compute_dtype)
    ccfg = R.build_criterion_config(opt)
    encode_text, frozen = R.build_text_encoder(opt, vocab, compute_dtype)
    tx = R.build_optimizer(opt)

    if getattr(opt, "cache_text", "on") == "on" and not (
        opt.tokenizer_type == "GloVeNLTK" and opt.load_vocab_pkl
    ):
        logger.info("Precomputing frozen-text encodings (one-time)...")
        R.cache_text_features(train_loader.dataset, encode_text, frozen)
        for vl in val_loaders.values():
            R.cache_text_features(vl.dataset, encode_text, frozen)

    mesh = make_mesh(opt.n_devices or None)
    repl = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)

    # initialize params from the first batch's shapes
    first_batch, _ = next(iter(train_loader))
    jb = _device_batch(first_batch)
    wf, wm, sf = encode_text(frozen, jb)
    init_rngs = {
        "params": jax.random.PRNGKey(opt.seed),
        "dropout": jax.random.PRNGKey(opt.seed + 1),
        "mask_words": jax.random.PRNGKey(opt.seed + 2),
    }
    variables = model.init(
        init_rngs,
        jb["video_feat"],
        jb["video_mask"],
        wf,
        wm,
        sf,
        (jnp.arange(jb["video_feat"].shape[0], dtype=jnp.int32) + 1)
        % jb["video_feat"].shape[0],
        is_training=True,
        deterministic=True,
        clip_mask=jb.get("clip_mask"),
        words_weight=jb.get("words_weight"),
        unknown_mask=jb.get("unknown_mask"),
        ss_sent_idx=jb.get("ss_sent_idx"),
        ss_sent_mask=jb.get("ss_sent_mask"),
        ss_own_pos=jb.get("ss_own_pos"),
        ss_video_feat=jb.get("ss_video_feat"),
        ss_video_mask=jb.get("ss_video_mask"),
    )
    params = jax.device_put(variables["params"], repl)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), repl),
        params=params,
        opt_state=jax.device_put(tx.init(params), repl),
    )
    frozen = jax.device_put(frozen, repl)
    count_parameters(state.params)

    start_epoch = 0
    if opt.resume is not None:
        logger.info(f"Load checkpoint from {opt.resume}")
        payload = load_checkpoint(opt.resume)
        state = state.replace(params=jax.device_put(payload["model"], repl))
        if opt.resume_all and payload.get("optimizer") is not None:
            state = state.replace(
                opt_state=jax.device_put(payload["optimizer"], repl)
            )
            start_epoch = payload["epoch"] + 1
    if opt.start_epoch is not None:
        start_epoch = opt.start_epoch
    elif opt.eval_untrained:
        start_epoch = -1

    train_step = make_train_step(
        model, ccfg, encode_text, tx,
        grad_accum=getattr(opt, "grad_accum", 1),
    )
    # eval during training also reports criterion losses (reference
    # train.py:156 -> eval.py:101-105); rec_fw is skipped at eval. One
    # jitted step per distinct coalesce factor (K capped by each loader's
    # batches-per-bucket so remainder padding can't dominate).
    _steps_by_k = {}
    from jax.flatten_util import ravel_pytree

    _, _params_unravel = ravel_pytree(state.params)

    def eval_step_for(loader):
        k = R.eval_coalesce_from_opt(opt, n_batches=len(loader))
        if k not in _steps_by_k:
            _steps_by_k[k] = make_eval_step(
                model, ccfg, encode_text, with_loss=True, coalesce=k,
                params_unravel=_params_unravel, superbatch=True,
            )
        return _steps_by_k[k]

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(opt.tensorboard_log_dir)
        tb_writer.add_text("hyperparameters", dict_to_markdown(vars(opt), max_str_len=None))
    except Exception as e:  # tensorboard optional
        logger.warning(f"tensorboard unavailable: {e}")

    # 'rbg' = XLA RngBitGenerator keys: the fused step's dropout/MLM-mask
    # randomness at ~8% of the threefry cost (BASELINE.md round-5 train
    # ledger; threefry mask recompute in the backward pass was ~46% of the
    # whole step). Deterministic per seed either way.
    if getattr(opt, "rng_impl", "rbg") == "rbg":
        rng = jax.random.key(opt.seed, impl="rbg")
    else:
        rng = jax.random.PRNGKey(opt.seed)
    prev_best = {k: 0.0 for k in val_loaders}
    es_cnt = 0
    stop = False

    for epoch_i in range(start_epoch, opt.n_epoch):
        if epoch_i > -1:
            lr = R.step_lr(opt.lr, epoch_i, opt.lr_drop, opt.gamma)
            state = set_learning_rate(state, lr)
            state, _ = train_epoch(
                train_step, state, frozen, train_loader, rng, opt, epoch_i, tb_writer, data_sh
            )

        if _PREEMPT.is_set():
            # epoch_i may be incomplete: record the last COMPLETED epoch so
            # --resume_all restarts at most one epoch back
            save_checkpoint(
                opt.ckpt_filepath.replace(".ckpt", "_latest.ckpt"),
                state.params,
                state.opt_state,
                epoch_i - 1,
                vars(opt),
            )
            with open(opt.train_log_filepath, "a") as f:
                f.write(
                    f"Preempted during epoch {epoch_i}; model_latest.ckpt "
                    "saved (resume with --resume_all)\n"
                )
            logger.info(
                f">>>>> Preempted during epoch {epoch_i}; latest checkpoint saved"
            )
            break

        if (epoch_i + 1) % opt.eval_epoch_interval == 0:
            for key, val_loader in val_loaders.items():
                logger.info(f"Evaluating {key} split")
                fname = f"{key}_latest_{opt.dataset_name}_val_preds.jsonl"
                metrics, metrics_nms, eval_loss_meters, latest_paths = eval_epoch(
                    ravel_pytree(state.params)[0],
                    frozen,
                    eval_step_for(val_loader),
                    val_loader,
                    opt,
                    fname,
                    val_loader.dataset.data,
                    with_loss=True,
                )
                loss_str = ""
                if eval_loss_meters:
                    weight_map = _weight_map(opt)
                    loss_str = " ".join(
                        f"{k} {v.avg * weight_map.get(k, 1.0):.4f}"
                        for k, v in eval_loss_meters.items()
                    )
                    if tb_writer is not None:
                        for k, v in eval_loss_meters.items():
                            tb_writer.add_scalar(
                                f"Eval/{k}", v.avg * weight_map.get(k, 1.0), epoch_i + 1
                            )
                with open(opt.eval_log_filepath, "a") as f:
                    f.write(
                        EVAL_LOG_FMT.format(
                            time_str=time.strftime("%Y_%m_%d_%H_%M_%S"),
                            epoch=epoch_i,
                            split=key,
                            loss_str=loss_str,
                            eval_metrics_str=json.dumps(metrics),
                        )
                    )
                logger.info(
                    "{} metrics_no_nms {}".format(key, pprint.pformat(metrics["brief"], indent=4))
                )
                if tb_writer is not None:
                    for k, v in metrics["brief"].items():
                        if v is not None:
                            tb_writer.add_scalar(f"Eval/{key}-{k}", float(v), epoch_i + 1)

                stop_score = metrics["brief"].get(f"MR-full-{opt.stop_score}") or 0.0
                if stop_score > prev_best[key]:
                    es_cnt = 0
                    prev_best[key] = stop_score
                    save_checkpoint(
                        opt.ckpt_filepath.replace(".ckpt", f"_{key}_best.ckpt"),
                        state.params,
                        state.opt_state,
                        epoch_i,
                        vars(opt),
                    )
                    for src in latest_paths:
                        # rename only in the filename: a result_dir that
                        # itself contains "latest" must not be rewritten
                        src_dir, src_name = os.path.split(src)
                        dst = os.path.join(src_dir, src_name.replace("latest", "best"))
                        if src != dst and os.path.exists(src):
                            os.replace(src, dst)
                    logger.info("The checkpoint file has been updated.")
                else:
                    es_cnt += 1
                    if opt.max_es_cnt != -1 and es_cnt > opt.max_es_cnt:
                        with open(opt.train_log_filepath, "a") as f:
                            f.write(f"Early Stop at epoch {epoch_i}")
                        logger.info(f">>>>> Early stop at epoch {epoch_i} {prev_best[key]}")
                        stop = True
                        break

                save_checkpoint(
                    opt.ckpt_filepath.replace(".ckpt", "_latest.ckpt"),
                    state.params,
                    state.opt_state,
                    epoch_i,
                    vars(opt),
                )
        if stop:
            break

        if (epoch_i + 1) % opt.save_interval == 0 or (epoch_i + 1) % opt.lr_drop == 0:
            save_checkpoint(
                opt.ckpt_filepath.replace(".ckpt", f"_e{epoch_i:04d}.ckpt"),
                state.params,
                state.opt_state,
                epoch_i,
                vars(opt),
            )

    if tb_writer is not None:
        tb_writer.close()
    return state, opt


if __name__ == "__main__":
    train()
