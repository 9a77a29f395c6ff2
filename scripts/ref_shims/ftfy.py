"""Minimal ftfy stand-in so the reference tokenizer module imports offline.

The real package is not installed in this container; the reference only
calls ftfy.fix_text (dataset/tokenizer.py) to repair mojibake, and the
synthetic parity corpora are pure ASCII, so identity is behavior-preserving
here. NOT a general replacement.
"""


def fix_text(text, **kwargs):
    return text
