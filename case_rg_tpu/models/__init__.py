from ..config import ModelConfig
from .base import MODEL_REGISTRY, get_model, register_model


def build_model_cfg(base: ModelConfig, name: str, vocab) -> ModelConfig:
    """Fill vocabulary-dependent fields of a ModelConfig."""
    return base.replace(name=name, vocab_size=len(vocab),
                        pad_id=vocab.pad_id, bos_id=vocab.bos_id,
                        unk_id=vocab.unk_id, eos_id=vocab.eos_id)


def create_model(name: str, cfg: ModelConfig):
    return get_model(name)(cfg=cfg)
