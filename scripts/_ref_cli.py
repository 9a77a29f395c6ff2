"""Launcher for the REFERENCE CLIs (/root/reference train.py / eval.py) in
this offline container. Usage:

    python scripts/_ref_cli.py train --config_file ... --device cpu ...
    python scripts/_ref_cli.py eval  --config_file ... --device cpu ...

Two environment shims, both behavior-documented:

* `ftfy` is not installed -> scripts/ref_shims/ftfy.py (identity fix_text;
  parity corpora are ASCII).
* The NLTK POS tagger data is not downloadable -> nltk.pos_tag is replaced
  with the SAME closed-class heuristic mesm_tpu uses when tagger data is
  absent (mesm_tpu/data/tokenizers.py pos_weights fallback): function words
  tag as 'IN' (weight 1), everything else as 'NN' (weight 2). POS tags feed
  ONLY the MLM masking distribution at train time (reference
  dataset/tokenizer.py encode -> words_weight -> model.py _mask_words);
  eval predictions are tag-independent. Patching both sides to the same
  tagger keeps the two pipelines' words_weight bit-comparable.

The reference train snapshot-copies model/*.py with RELATIVE paths
(utils/config.py parse), so this launcher chdirs to /root/reference.
"""
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_ROOT = "/root/reference"

sys.path.insert(0, os.path.join(HERE, "ref_shims"))
sys.path.insert(0, REF_ROOT)

# Keep mesm_tpu's list authoritative: load the tokenizers module standalone
# (no package import — that would pull in JAX before torch DataLoader forks).
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_mesm_tokenizers",
    os.path.join(os.path.dirname(HERE), "mesm_tpu", "data", "tokenizers.py"),
)
_tok = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tok)
FUNCTION_WORDS = _tok._FUNCTION_WORDS

import nltk


def _heuristic_pos_tag(words):
    return [
        (w, "IN" if str(w).lower() in FUNCTION_WORDS else "NN") for w in words
    ]


nltk.pos_tag = _heuristic_pos_tag

# The reference saves argparse.Namespace inside its checkpoints
# (train.py:185-214); torch >= 2.6 defaults torch.load(weights_only=True)
# which rejects that global. These are checkpoints this very harness just
# produced locally, so allowlisting the type is safe here.
import argparse

import torch.serialization

torch.serialization.add_safe_globals([argparse.Namespace])


def main():
    mode = sys.argv.pop(1)
    os.chdir(REF_ROOT)
    if mode == "train":
        import train as ref_train

        ref_train.train()
    elif mode == "eval":
        import eval as ref_eval

        ref_eval.inference()
    elif mode == "init":
        # Dump the reference model's SEEDED INITIALIZATION as a full torch
        # checkpoint (text encoder included: reference train.py:120 resumes
        # with a strict load_state_dict, so every key must be present;
        # mesm_tpu's converter ignores frozen text_encoder.* keys —
        # convert.py torch_state_dict_to_params `allowed` list). Used by
        # scripts/ref_train_parity.py to start BOTH training pipelines from
        # identical weights.  Usage: init --config_file CFG --out PATH
        i = sys.argv.index("--out")
        out = os.path.abspath(sys.argv[i + 1])
        del sys.argv[i : i + 2]

        import torch
        import train as ref_train
        from runner import build_model, build_vocab, build_vocab_from_pkl
        from utils.config import BaseOptions

        opt = BaseOptions().parse()
        ref_train.set_seed(opt.seed)
        if opt.tokenizer_type == "GloVeSimple":
            vocab = build_vocab(opt)
        elif opt.tokenizer_type == "GloVeNLTK":
            vocab = (
                build_vocab_from_pkl(opt) if opt.load_vocab_pkl else build_vocab(opt)
            )
        else:
            vocab = None
        model = build_model(opt, vocab)
        torch.save({"model": model.state_dict(), "epoch": -1, "opt": opt}, out)
        print(f"wrote {out}")
    else:
        raise SystemExit(f"unknown mode {mode!r} (want train|eval|init)")


if __name__ == "__main__":
    main()
