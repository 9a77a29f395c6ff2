"""Parse a jax.profiler xplane trace into a per-op timing table.

The reference's only instrumentation is four wall-clock meters
(reference train.py:48-79). This goes further: capture a device trace with
`jax.profiler.trace(dir)`, then `report(dir)` aggregates XLA op durations on
the device plane — the timing breakdown that drives kernel/fusion work.

Parsing uses the xplane proto bundled with tensorflow
(tensorflow.tsl.profiler.protobuf.xplane_pb2); no tensorboard frontend
needed. Works on any saved trace directory, so traces captured on the TPU
host can be inspected offline.
"""
from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def device_op_totals(
    trace_dir: str, plane_filter: str = "TPU", line_filter: str = "XLA Ops"
) -> Tuple[Dict[str, float], Dict[str, int], float, str]:
    """Aggregate per-op-name durations (ms) on the device compute stream.

    Returns (op_name -> total_ms, op_name -> count, line_total_ms,
    plane_name). The 'XLA Ops' line is the synchronous compute stream; the
    'Async XLA Ops' line holds overlapped DMA copies whose durations
    double-count against compute and are therefore excluded by default."""
    xspace = _load_xspace(trace_dir)
    plane = None
    for p in xspace.planes:
        if plane_filter.lower() in p.name.lower():
            plane = p
            break
    if plane is None:
        names = [p.name for p in xspace.planes]
        raise ValueError(f"no plane matching {plane_filter!r}; planes: {names}")

    totals: Dict[str, float] = defaultdict(float)
    counts: Dict[str, int] = defaultdict(int)
    line_total = 0.0
    for line in plane.lines:
        if line_filter and line.name != line_filter:
            continue
        for ev in line.events:
            md = plane.event_metadata.get(ev.metadata_id)
            name = md.name if md is not None else f"op_{ev.metadata_id}"
            dur_ms = ev.duration_ps / 1e9
            totals[name] += dur_ms
            counts[name] += 1
            line_total += dur_ms
    return dict(totals), dict(counts), line_total, plane.name


def report(trace_dir: str, top: int = 30, plane_filter: str = "TPU") -> str:
    totals, counts, total_ms, plane_name = device_op_totals(trace_dir, plane_filter)
    lines = [
        f"plane: {plane_name} (XLA Ops line; async DMA excluded)",
        f"compute-stream busy {total_ms:.2f} ms over {sum(counts.values())} op launches",
        f"{'op':58s} {'ms':>9s} {'%':>6s} {'n':>6s}",
    ]
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(
            f"{name[:58]:58s} {ms:9.3f} {100 * ms / max(total_ms, 1e-9):6.2f} {counts[name]:6d}"
        )
    return "\n".join(lines)


def module_totals(
    trace_dir: str, plane_filter: str = "TPU", depth: int = 3
) -> Tuple[Dict[str, float], float]:
    """Aggregate compute-stream time by model-module path (the `tf_op`
    metadata XLA attaches to each op), truncated to `depth` path segments —
    e.g. 'MESM/transformer/encoder'. The actionable view: which part of the
    MODEL the time goes to, independent of how XLA fused it."""
    xspace = _load_xspace(trace_dir)
    plane = next(p for p in xspace.planes if plane_filter.lower() in p.name.lower())
    stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
    md_module: Dict[int, str] = {}
    for mid, md in plane.event_metadata.items():
        label = "<unattributed>"
        for st in md.stats:
            if stat_names.get(st.metadata_id) == "tf_op":
                path = st.str_value.split(":")[0]
                parts = [s for s in path.split("/") if s][1:]  # drop jit(fn)
                label = "/".join(parts[:depth]) if parts else "<top>"
                break
        md_module[mid] = label
    totals: Dict[str, float] = defaultdict(float)
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            ms = ev.duration_ps / 1e9
            totals[md_module.get(ev.metadata_id, "<unattributed>")] += ms
            total += ms
    return dict(totals), total


def module_report(trace_dir: str, depth: int = 3, plane_filter: str = "TPU") -> str:
    totals, total = module_totals(trace_dir, plane_filter, depth)
    lines = [
        f"compute-stream busy {total:.2f} ms by module path (depth {depth})",
        f"{'module':58s} {'ms':>9s} {'%':>6s}",
    ]
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
        if ms < total * 0.002:
            continue
        lines.append(f"{name[:58]:58s} {ms:9.3f} {100 * ms / max(total, 1e-9):6.2f}")
    return "\n".join(lines)


def _main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--by-module", action="store_true")
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()
    if args.by_module:
        print(module_report(args.trace_dir, args.depth, args.plane))
    else:
        print(report(args.trace_dir, args.top, args.plane))


if __name__ == "__main__":
    _main()
