from captionax.decode.search import (
    BeamResult,
    beam_search,
    greedy,
    sample,
)

__all__ = ["BeamResult", "beam_search", "greedy", "sample"]
