"""Prefetching input pipeline.

The reference leans on torch DataLoader worker processes with per-call HDF5
opens (runner.py:88-98). Here a small thread pool assembles fixed-shape numpy
batches ahead of the training step (HDF5 + numpy release the GIL for the
heavy parts), with bounded lookahead so host IO overlaps device compute —
double buffering at the host->device boundary is the important part on TPU.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

_SENTINEL = object()

# Per-WORKER loader (each pool worker process gets its own copy via the pool
# initializer below; nothing is shared through the parent's module state, so
# two process-mode loaders can iterate concurrently).
_worker_loader = None


def _process_worker_init(loader):
    global _worker_loader
    _worker_loader = loader


def _process_worker_build(idx_batch):
    return _worker_loader._build(idx_batch)


class Loader:
    """Batch loader with three worker modes:

    - thread (default): a small thread pool; HDF5 and numpy release the GIL
      for the heavy parts, and per-thread HDF5 handles let reads overlap.
    - process: a fork-based worker pool for hosts where collate's Python
      work (tokenizing, mask assembly) is the bottleneck — the reference
      uses torch DataLoader worker processes the same way (runner.py:88-98).
      Workers never touch JAX; FeatureStore re-opens its HDF5 handles after
      the fork (data/hdf5.py pid check). Built batches return to the parent
      via pickle, so feature-heavy batches pay an IPC copy — on this image's
      single-core host the thread mode measures faster; process mode exists
      for real multi-core TPU hosts (--loader_mode).
    - anything with num_workers <= 1: synchronous.
    """

    def __init__(
        self,
        dataset,
        batcher,
        collate: Callable,
        num_workers: int = 2,
        prefetch: int = 3,
        mode: str = "thread",
    ):
        self.dataset = dataset
        self.batcher = batcher
        self.collate = collate
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch, 1)
        self.mode = mode

    def _build(self, idx_batch):
        entries = [self.dataset[i] for i in idx_batch]
        return self.collate(entries)

    def _iter_process(self, batches) -> Iterator:
        import multiprocessing as mp

        # Pool workers never report item visits back to the parent, so
        # per-epoch randomness comes from the dataset's epoch offset instead:
        # the FIRST process-mode epoch pins the offset at 0 (matching thread
        # mode's epoch-0 visit counts, so both modes draw the same
        # augmentation stream), later epochs advance it.
        ds = self.dataset
        if hasattr(ds, "advance_epoch"):
            if getattr(ds, "_epoch_offset", None) is None:
                ds._epoch_offset = 0
            else:
                ds.advance_epoch()

        # forkserver, not fork: the parent holds a live (multithreaded) JAX
        # runtime, and forking it can deadlock in the child (inherited lock
        # state). The forkserver's children are forked from a clean helper
        # process; the loader reaches each worker by pickle via the pool
        # initializer (dataset/collate implement __getstate__ as needed).
        ctx = mp.get_context("forkserver")
        pool = ctx.Pool(
            self.num_workers, initializer=_process_worker_init, initargs=(self,)
        )
        try:
            # imap preserves batch order; bounded internally by the pool
            for built in pool.imap(_process_worker_build, batches, chunksize=1):
                yield built
        finally:
            pool.terminate()
            pool.join()

    def __iter__(self) -> Iterator:
        batches = list(self.batcher)
        if self.num_workers <= 1:
            for idxs in batches:
                yield self._build(idxs)
            return
        if self.mode == "process":
            yield from self._iter_process(batches)
            return

        in_q: "queue.Queue" = queue.Queue()
        for i, idxs in enumerate(batches):
            in_q.put((i, idxs))
        for _ in range(self.num_workers):
            in_q.put(_SENTINEL)

        results: dict = {}
        errors: list = []
        next_slot = [0]
        cond = threading.Condition()

        def worker():
            while True:
                item = in_q.get()
                if item is _SENTINEL:
                    with cond:
                        cond.notify_all()
                    return
                slot, idxs = item
                try:
                    built = self._build(idxs)
                except Exception as e:
                    with cond:
                        errors.append(e)
                        cond.notify_all()
                    return
                with cond:
                    # bounded lookahead: don't run too far ahead of the consumer
                    while slot > next_slot[0] + self.prefetch and not errors:
                        cond.wait(timeout=10)
                    results[slot] = built
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for produced in range(len(batches)):
            with cond:
                while next_slot[0] not in results:
                    if errors:
                        raise errors[0]
                    if not any(t.is_alive() for t in threads):
                        raise RuntimeError("loader workers exited early")
                    cond.wait(timeout=10)
                built = results.pop(next_slot[0])
                next_slot[0] += 1
                cond.notify_all()
            yield built

    def __len__(self) -> int:
        return len(self.batcher)


def stage_batch(batch, cast_bf16: bool):
    """Host batch -> device batch: optional bf16 cast of float feature
    tensors before transfer, plus the qvh per-group SS video expansion."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jb = {}
    for k, v in batch.items():
        a = np.asarray(v)
        if cast_bf16 and a.dtype == np.float32 and a.ndim >= 3:
            a = a.astype(jnp.bfloat16)
        jb[k] = jax.device_put(a)
    if "ss_video_feat_groups" in jb:
        jb["ss_video_feat"] = jb.pop("ss_video_feat_groups")[jb["ss_group_slot"]]
        jb["ss_video_mask"] = jb.pop("ss_video_mask_groups")[jb["ss_group_slot"]]
        del jb["ss_group_slot"]
    return jb


_warned_rowmajor_fallback = False


def _warn_rowmajor_fallback_once(e):
    global _warned_rowmajor_fallback
    if not _warned_rowmajor_fallback:
        _warned_rowmajor_fallback = True
        import logging

        logging.getLogger(__name__).warning(
            "row-major layout pin unsupported on this backend (%s); "
            "falling back to default layout — the superbatch "
            "video_feat_rows staging may pay a relayout copy", e
        )


def _put_rows_rowmajor(a):
    """device_put a 2-D array pinned to the row-major (0, 1) layout.

    Falls back to a plain device_put where explicit layouts are unsupported
    (CPU test backend, older runtimes) — there the default layout is already
    row-major, so the pin is a no-op anyway. Only API-availability errors
    fall back: real transfer failures (OOM, bad device) must propagate, and
    a silently-dropped pin would reintroduce the 1.49 ms relayout copy with
    no signal, so the fallback warns once."""
    import jax

    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
    except ImportError:
        Format = None
    if Format is not None:
        try:
            fmt = Format(
                Layout(major_to_minor=(0, 1)),
                SingleDeviceSharding(jax.devices()[0]),
            )
            return jax.device_put(a, fmt)
        except jax.errors.JaxRuntimeError as e:
            # PJRT C-API clients without the layouts extension reject the
            # explicit Format at RUNTIME (UNIMPLEMENTED) — that is an
            # API-availability failure and falls back like the Python-layer
            # ones below; real transfer failures (OOM etc.) re-raise.
            if "UNIMPLEMENTED" not in str(e) and "layout" not in str(e).lower():
                raise
            _warn_rowmajor_fallback_once(e)
            return jax.device_put(a)
        except (TypeError, NotImplementedError, ValueError) as e:
            _warn_rowmajor_fallback_once(e)
    return jax.device_put(a)


def stage_superbatch(batches, cast_bf16: bool):
    """K same-shape host batches -> ONE device batch with leading K axis.

    Feeds make_eval_step(coalesce=K, superbatch=True): one np.stack + one
    device_put per FIELD (~15 transfers per K batches instead of K*15),
    which matters on hosts where dispatch/transfer cost scales with the
    argument-handle count. The bf16 cast happens on the host copy the stack
    makes anyway, so no extra pass over the bytes.

    The qvh per-group SS video expansion (see stage_batch) runs on the
    stacked arrays as one batched gather per superbatch.

    The deduplicated unique-video features (`video_feat_g`) are staged as a
    2-D `video_feat_rows` (K*NG*Lv, Dv) array PINNED to the row-major
    layout: this environment's transfer path commits >=3-D wide arrays in a
    padding-minimizing layout (e.g. bf16 (8,53,194,2818) lands major_to_minor
    (1,2,0,3)), and the compiled eval program then pays a full relayout copy
    of the 463 MB stack on the compute stream (HLO copy.745, 1.49 ms per
    dispatch, traces/r4_ctrl) before the fused LN->Dense can consume it.
    Pinned 2-D rows transfer FASTER than the 4-D stack (1.37 s vs 2.87 s
    measured) and feed parallel/step._hoist_video_proj with zero copies —
    only the narrow (rows, d) projection output is reshaped in-program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    keys = batches[0].keys()
    rows_staged = "video_feat_g" in keys
    jb = {}
    for k in keys:
        a = np.stack([np.asarray(b[k]) for b in batches])
        if cast_bf16 and a.dtype == np.float32 and a.ndim >= 4:
            a = a.astype(jnp.bfloat16)
        if k == "video_feat_g":
            jb["video_feat_rows"] = _put_rows_rowmajor(
                a.reshape(-1, a.shape[-1])
            )
            continue
        if k == "video_slot" and rows_staged:
            from mesm_tpu import kernels as _k

            if _k.FLAT_HOIST:
                # FLAT_HOIST (measured negative, see parallel/step.py): the
                # flat projection is gathered with a GLOBAL slot (k*NG +
                # slot). Staged under a DISTINCT key so a step traced with
                # the other hoist form fails loudly (KeyError) instead of
                # gathering wrong rows — XLA clamps out-of-range gather
                # indices silently, so a shared key + mismatched flag would
                # corrupt predictions with no error.
                NG = np.asarray(batches[0]["video_feat_g"]).shape[0]
                a = a + (np.arange(len(batches), dtype=a.dtype) * NG)[:, None]
                jb["video_slot_flat"] = jax.device_put(a)
                continue
        jb[k] = jax.device_put(a)
    if "ss_video_feat_groups" in jb:
        slot = jb.pop("ss_group_slot")  # (K, B)
        lead = jnp.arange(slot.shape[0])[:, None]
        jb["ss_video_feat"] = jb.pop("ss_video_feat_groups")[lead, slot]
        jb["ss_video_mask"] = jb.pop("ss_video_mask_groups")[lead, slot]
    return jb


def device_feed(loader, compute_dtype=None, depth: int = 2):
    """Stage host batches onto the device ahead of consumption.

    Yields (jb, batch, meta): `jb` device arrays (dispatched asynchronously,
    so the transfer of batch N+1 overlaps the step on batch N — double
    buffering at the host->device boundary), `batch` the original numpy
    arrays for host-side decoding. When `compute_dtype` is bfloat16, large
    float feature tensors (ndim >= 3) are cast to bf16 BEFORE the transfer —
    the model casts them anyway, and feature bytes dominate H2D traffic.

    The qvh per-group SS video expansion (collate stores each group's video
    once) happens here on host indices, mirroring train.py/evaluate.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cast = compute_dtype is not None and jnp.dtype(compute_dtype) == jnp.bfloat16

    def put(batch):
        return stage_batch(batch, cast)

    from collections import deque

    buf: deque = deque()
    for batch, meta in loader:
        buf.append((put(batch), batch, meta))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
