from captionax.eval.cider import Cider, cider_score
from captionax.eval.bleu import corpus_bleu
from captionax.eval.rouge import rouge_l, rouge_l_corpus
from captionax.eval.meteor import meteor_score, meteor_corpus
from captionax.eval.ptbtok import PTBTokenizer, ptb_tokenize
from captionax.eval.metrics import (
    CaptionMetrics,
    ids_to_text,
    logits_to_text,
    clean_sentence,
    metric_score,
    metric_score_test,
)

__all__ = [
    "Cider",
    "cider_score",
    "corpus_bleu",
    "rouge_l",
    "rouge_l_corpus",
    "meteor_score",
    "meteor_corpus",
    "PTBTokenizer",
    "ptb_tokenize",
    "CaptionMetrics",
    "ids_to_text",
    "logits_to_text",
    "clean_sentence",
    "metric_score",
    "metric_score_test",
]
