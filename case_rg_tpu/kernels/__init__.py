from .additive_attention import additive_scores
