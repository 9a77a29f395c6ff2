"""Root-level evaluation CLI, reference-compatible.

Mirrors the reference's public surface (`/root/reference/README.md:146-154`:
``python eval.py --config_file config/..._eval.json --trained_result_dir ...``)
by delegating to :func:`mesm_tpu.evaluate.inference`, which reloads the
training run's ``opt.json`` exactly like the reference's ``TestOptions``
(`/root/reference/utils/config.py:249-259`).
"""
import sys

from mesm_tpu.evaluate import inference

if __name__ == "__main__":
    inference(sys.argv[1:])
