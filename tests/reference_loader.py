"""Import the reference implementation (read-only) for parity testing.

bcolz and transformers are stubbed: the reference imports them at module
scope (common/Utils.py:4,11) but the model math touches neither. ``torch`` is
injected through the transformers stub because the reference's Utils relies
on the old ``from transformers import *`` re-exporting torch.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference():
    if REFERENCE_PATH not in sys.path:
        sys.modules.setdefault("bcolz", types.ModuleType("bcolz"))
        import torch
        tr = types.ModuleType("transformers")
        tr.torch = torch
        tr.__all__ = ["torch"]
        # FORCE the stub even when the real transformers is already
        # imported (test_data_pipeline's HF-parity tests run earlier in
        # the suite): the reference's ``from transformers import *``
        # (common/Utils.py:11) would otherwise resolve the real
        # package's ENTIRE lazy-import surface, which explodes on this
        # image (models.smolvlm fails to import). No test after the
        # parity files needs the real package; already-bound names from
        # earlier tests keep their references.
        sys.modules["transformers"] = tr
        sys.path.insert(0, REFERENCE_PATH)
    import importlib
    return importlib


def make_vocab(v: int):
    vocab2id = {"[PAD]": 0, "[unused0]": 1, "[UNK]": 2, "[unused1]": 3,
                "[SEP]": 4, "[CLS]": 5, "[MASK]": 6}
    for i in range(len(vocab2id), v):
        vocab2id[f"w{i}"] = i
    id2vocab = {i: w for w, i in vocab2id.items()}
    return vocab2id, id2vocab
