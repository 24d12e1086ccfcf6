"""Load the vendored reference implementation for golden-parity tests.

The reference (/root/reference) is torch code written for an older Python /
transformers; importing it under this environment needs a few inert shims:

- ``ujson`` (absent) -> stdlib ``json`` (drop-in for loads/dumps here);
- ``git`` (gitpython, absent) -> stub module (only touched when exporting
  run metadata, which the parity tests never do);
- ``transformers.AdamW`` was removed upstream -> alias torch.optim.AdamW
  (imported at module scope by colbert/training/training.py);
- Python 3.12 dataclasses reject unhashable instance defaults; the
  reference's ``DefaultVal`` dataclass (colbert/infra/config/core_config.py)
  is used as a field default throughout settings.py, so we give it a
  __hash__ via an import hook that patches the module right after exec.

Nothing in the reference tree is modified; everything is runtime patching.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import json
import sys
import types

COLBERT_ROOT = "/root/reference/third_party/ColBERT"
VQA_EVAL_PATH = "/root/reference/src/utils/vqaEval.py"


class _DefaultValHashFinder(importlib.abc.MetaPathFinder):
    """Patch DefaultVal.__hash__ between core_config and settings exec."""

    def find_spec(self, name, path, target=None):
        if name != "colbert.infra.config.core_config":
            return None
        spec = importlib.machinery.PathFinder.find_spec(name, path)
        if spec is None:
            return None
        orig_exec = spec.loader.exec_module

        class _Loader(importlib.abc.Loader):
            def create_module(self, s):
                return None

            def exec_module(self, mod):
                orig_exec(mod)
                mod.DefaultVal.__hash__ = (
                    lambda self: hash(repr(self.val)))

        spec.loader = _Loader()
        return spec


_installed = False


def load_reference_colbert():
    """Import and return the reference ``colbert`` package (torch)."""
    global _installed
    if not _installed:
        sys.modules.setdefault("ujson", json)
        if "git" not in sys.modules:
            git = types.ModuleType("git")
            git.Repo = object
            sys.modules["git"] = git
        import torch
        import transformers
        if not hasattr(transformers, "AdamW"):
            transformers.AdamW = torch.optim.AdamW
        if COLBERT_ROOT not in sys.path:
            sys.path.insert(0, COLBERT_ROOT)
        sys.meta_path.insert(0, _DefaultValHashFinder())
        _installed = True
    import colbert  # noqa: F401
    return colbert


def load_reference_vqaeval():
    """Load the official VQAEval class (src/utils/vqaEval.py, imports only
    re/sys so it can be loaded standalone)."""
    spec = importlib.util.spec_from_file_location("_ref_vqaEval",
                                                  VQA_EVAL_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.VQAEval


def make_standard_layout_vocab(tmp_path, words):
    """Write a bert-base-uncased-layout vocab dir the reference tokenizers
    accept (their asserts pin [unused0]=1 and [MASK]=103).

    Returns (dir_path, vocab_file_path).
    """
    rows = ["[PAD]"] + [f"[unused{i}]" for i in range(99)]
    rows += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    rows += list(words)
    d = tmp_path / "ref_vocab"
    d.mkdir(exist_ok=True)
    vf = d / "vocab.txt"
    vf.write_text("\n".join(rows) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizer", "do_lower_case": True,
         "model_max_length": 512}))
    return str(d), str(vf)
