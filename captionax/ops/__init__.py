from captionax.ops.decode_kernel import fused_beam_search, fused_greedy

__all__ = ["fused_beam_search", "fused_greedy"]
