"""Worker process for tests/test_multihost.py's 2-process CPU cluster.

Prints one JSON line with the sharded-compute results so the parent can
compare against the single-process oracle. Must force the CPU platform
AFTER importing jax (the container's sitecustomize pins JAX_PLATFORMS to
the TPU plugin and rewrites plain env overrides — see
.claude/skills/verify/SKILL.md)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mesm_tpu.parallel import multihost as mh  # noqa: E402
from mesm_tpu.parallel.mesh import make_mesh, replicated_sharding  # noqa: E402


def main():
    pid = int(os.environ["MESM_MH_PROCESS_ID"])
    n = int(os.environ["MESM_MH_NUM_PROCESSES"])
    mh.init_distributed(os.environ["MESM_MH_COORDINATOR"], n, pid)
    assert jax.process_count() == n, jax.process_count()

    mesh = make_mesh()  # all global devices, 1-D data axis
    B, L, D = 16, 6, 8
    rng = np.random.default_rng(7)  # SAME batch on every process
    full = {
        "x": rng.standard_normal((B, L, D)).astype(np.float32),
        "mask": (rng.random((B, L)) > 0.3).astype(np.float32),
    }
    local = mh.local_view(full)  # this process's rows only
    gb = mh.global_batch(mesh, local, global_rows=B)
    assert gb["x"].shape == (B, L, D), gb["x"].shape

    def f(b):
        # row-wise masked mean then a BATCH-GLOBAL reduction: the mean over
        # the sharded row axis becomes a cross-process collective on the
        # data axis
        per_row = (b["x"].sum(-1) * b["mask"]).sum(-1) / (
            b["mask"].sum(-1) + 1e-6
        )
        return per_row.mean(), (per_row * per_row).sum()

    out = jax.jit(f, out_shardings=replicated_sharding(mesh))(gb)
    vals = [float(v) for v in jax.device_get(out)]
    print(json.dumps({
        "process": pid,
        "n_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "vals": vals,
    }), flush=True)


if __name__ == "__main__":
    main()
