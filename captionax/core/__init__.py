from captionax.core.vocab import Vocab, build_vocab, load_vocab_pickle
from captionax.core.tokenize import word_tokenize

__all__ = ["Vocab", "build_vocab", "load_vocab_pickle", "word_tokenize"]
