"""Typed configuration tree for the framework.

The reference scatters hyperparameters across per-model argparse blocks
(e.g. CaSE/Run.py:66-80), hard-coded prep constants (Prepare_dataset.py:13-20)
and in-code literals (CaSE/Model.py:261-265). Here every knob lives in one
dataclass tree with CLI overrides applied by ``cli/run.py``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Offline featurization constants (ref: Prepare_dataset.py:13-20)."""

    dataset: str = "cast"
    data_path: str = "./dataset/"
    query_len: int = 60
    passage_len: int = 100
    num_passage: int = 10
    max_span_size: int = 4
    answer_len: int = 40          # max_target_length in the reference
    min_window_size: int = 4      # GLKS
    num_windows: int = 1          # GLKS
    pool_topk: int = 10
    pool_candidates: int = 100    # load_pool(topk=10*topk) (Prepare_dataset.py:153)
    vocab_file: Optional[str] = None   # BERT-style vocab.txt; None => corpus vocab
    vocab_min_freq: int = 1
    seed: int = 123456


@dataclass(frozen=True)
class ModelConfig:
    """Architecture knobs shared by the six models."""

    name: str = "case"
    vocab_size: int = 0           # filled in from the vocabulary at build time
    # special-token ids (corpus-vocab defaults; overridden from the vocab)
    pad_id: int = 0
    bos_id: int = 1
    unk_id: int = 2
    eos_id: int = 3
    embedding_size: int = 256
    hidden_size: int = 256
    num_heads: int = 8
    enc_layers: int = 3           # TransformerSeqEncoder depth (CaSE/Model.py:261)
    dec_layers: int = 4           # per-memory decoder depth (CaSE/Model.py:265)
    num_memories: int = 2
    tmemnet_layers: int = 8       # TMemNet enc/dec depth (TMemNet/Model.py:52,110)
    dropout: float = 0.1
    gru_dropout: float = 0.5      # baselines' embedding dropout (S2SA/Model.py:62)
    max_target_length: int = 40
    max_dec_len: int = 40
    beam_width: int = 1
    max_span_size: int = 4
    min_window_size: int = 4      # GLKS
    num_windows: int = 1          # GLKS
    label_smoothing: float = 0.0
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # set "bfloat16" for TPU speed runs

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization setup (ref: CaSE/Run.py:27-28, common/CumulativeTrainer.py)."""

    batch_size: int = 16
    epochs: int = 20
    learning_rate: float = 2.5e-4
    warmup_steps: int = 2000
    num_cycles: int = 1            # cosine-with-hard-restarts cycles
    accumulation_steps: int = 1
    grad_clip: float = 1.0
    ema_decay: float = 0.995
    compute_dtype: str = "float32"   # "bfloat16": f32 master params, bf16 fwd/bwd
    remat: str = ""                  # rematerialize the forward in backward:
                                     # "" (save all residuals), "dots"
                                     # (save matmul outputs only — recompute
                                     # elementwise chains), "nothing" (full
                                     # recompute). Numerics-identical; a
                                     # HBM-traffic lever (docs/PERF.md r11)
    seed: int = 123456
    log_every: int = 100
    checkpoint_every_steps: int = 0   # 0 = epoch-end only
    ckpt_backend: str = "msgpack"     # "orbax": async, sharded (train/checkpoint.py)
    output_path: str = "./output/"
    resume: bool = True
    # parallelism
    data_axis: str = "data"
    model_axis: str = "model"
    mesh_shape: Tuple[int, ...] = ()   # () => all local devices on the data axis
    shard_vocab_dim: bool = False      # shard embedding/generator over 'model'
    pool_shard: bool = False           # shard the passage-pool axis over 'model'
                                       # (runtime/mesh.POOL_AXIS_KEYS)


@dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 16
    beam_width: int = 1
    output_path: str = "./output/"


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)


# The reference's per-dataset constructor defaults differ, but
# Prepare_dataset.py:241-311 passes the same global constants
# (query_len=60, passage_len=100, num_passage=10, max_target_length=40)
# to every model's dataset, so featurization shapes are shared.
MODEL_NAMES = ("case", "masque", "glks", "tmemnet", "gttp", "s2sa")
