from .masking import (causal_mask, lengths_from_mask, masked_mean,
                      masked_softmax, neg_inf, padding_mask)
from .attention import MultiHeadAttention, attend
from .bilinear import BilinearAttention
from .blocks import TransformerBlock
from .copynet import copy_prob_at, copy_scatter
from .embedding import Embedding
from .gru import GRU, gru_gates
from .highway import Highway
from .interaction import Interaction
from .positional import PositionalEmbedding, sinusoid_table
from .transformer import Decoder, DecoderLayer, Encoder, EncoderLayer, FeedForward

__all__ = [
    "causal_mask", "lengths_from_mask", "masked_mean", "masked_softmax",
    "neg_inf", "padding_mask", "MultiHeadAttention", "attend",
    "BilinearAttention", "TransformerBlock", "copy_prob_at", "copy_scatter",
    "Embedding", "GRU", "gru_gates", "Highway", "Interaction",
    "PositionalEmbedding", "sinusoid_table", "Decoder", "DecoderLayer",
    "Encoder", "EncoderLayer", "FeedForward",
]
