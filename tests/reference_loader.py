"""Import the reference implementation (read-only) for parity testing.

bcolz and transformers are stubbed WHILE the reference modules import: the
reference pulls both in at module scope (common/Utils.py:4,11) but the model
math touches neither. ``torch`` is injected through the transformers stub
because the reference's Utils relies on the old ``from transformers import *``
re-exporting torch. Resolving the REAL transformers package through that star
import would walk its entire lazy-import surface, which explodes on this
image (models.smolvlm fails to import) — hence the stub.

Isolation contract (VERDICT r3 weak-1): the stub must NOT leak to other test
files in the same pytest process (test_data_pipeline's HF-parity tests need
the real ``transformers.BertTokenizer``). ``load_reference`` therefore
EAGERLY imports every reference module any parity test touches while the
stub is installed, then RESTORES the prior ``sys.modules`` entries. The
reference modules' ``from transformers import *`` bindings were taken at
import time, so the cached modules keep working after the restore, and any
later ``import transformers`` resolves the real package again.
"""

import importlib
import sys
import types

REFERENCE_PATH = "/root/reference"

# Every reference module a parity test imports lazily in its body (plus their
# common.* dependency roots). Imported eagerly under the stub so the stub can
# be uninstalled before any other test file runs.
_REFERENCE_MODULES = [
    "common.Constants",
    "common.Utils",
    "common.PositionalEmbedding",
    "common.Highway",
    "common.BilinearAttention",
    "common.Interaction",
    "common.TransformerEncoder",
    "common.TransformerDecoder",
    "common.TransformerBlock",
    "common.TransformerSeqEncoderDecoder",
    "common.GRUSeqEncoderDecoder",
    "common.Generations",
    "common.EMA",
    "common.CumulativeTrainer",
    "CaSE.Model",
    "CaSE.CaSEDataset",
    "Masque.Model",
    "Masque.MasqueDataset",
    "GLKS.Model",
    "GLKS.GLKSDataset",
    "GLKS.EncDecModel",
    "GTTP.Model",
    "GTTP.GTTPDataset",
    "GTTP.EncDecModel",
    "TMemNet.Model",
    "TMemNet.TMemNetDataset",
    "TMemNet.EncDecModel",
    "S2SA.Model",
    "S2SA.S2SADataset",
    "S2SA.EncDecModel",
]

_loaded = False
_MISSING = object()


def load_reference():
    """Import the reference package under temporary stubs; idempotent."""
    global _loaded
    if _loaded:
        return importlib
    saved = {name: sys.modules.get(name, _MISSING)
             for name in ("transformers", "bcolz")}
    import torch
    tr = types.ModuleType("transformers")
    tr.torch = torch
    tr.__all__ = ["torch"]
    sys.modules["transformers"] = tr
    sys.modules.setdefault("bcolz", types.ModuleType("bcolz"))
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        for name in _REFERENCE_MODULES:
            importlib.import_module(name)
    finally:
        for name, mod in saved.items():
            if mod is _MISSING:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod
    _loaded = True
    return importlib


def make_vocab(v: int):
    vocab2id = {"[PAD]": 0, "[unused0]": 1, "[UNK]": 2, "[unused1]": 3,
                "[SEP]": 4, "[CLS]": 5, "[MASK]": 6}
    for i in range(len(vocab2id), v):
        vocab2id[f"w{i}"] = i
    id2vocab = {i: w for w, i in vocab2id.items()}
    return vocab2id, id2vocab
