from tda596_lab02mapreduce_spark.functions.text import tokenize, tokens_nonempty
from tda596_lab02mapreduce_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = ["tokenize", "tokens_nonempty", "cosine_sim", "dot", "l2_norm"]
