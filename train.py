"""Root-level training CLI, reference-compatible.

Mirrors the reference's public surface (`/root/reference/README.md:131-139`:
``python train.py --config_file config/... --exp_id ...``) by delegating to
:func:`mesm_tpu.train.train`, which accepts the same flag set
(`mesm_tpu/config.py` reproduces the reference's `utils/config.py` options).
"""
import sys

from mesm_tpu.train import train

if __name__ == "__main__":
    train(sys.argv[1:])
