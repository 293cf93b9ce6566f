from captionax.ops.conv_kernel import fused_stage, pack_stage
from captionax.ops.decode_kernel import fused_beam_search, fused_greedy

__all__ = ["fused_beam_search", "fused_greedy", "fused_stage",
           "pack_stage"]
