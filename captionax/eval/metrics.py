"""Batch caption metrics with reference `metric_score` semantics.

Replicates /root/reference/utils.py:229-334: decode gt/pred token ids to
text via the vocab (skipping <pad>/<s>, stopping at </s>; predictions are
argmaxed logits), then compute BLEU-1..4, METEOR, ROUGE-L and corpus-mode
CIDEr over the batch.  Unlike the reference — which runs these on the CPU on
*every training step* — the training harness here calls this off the step
path (eval only / async host callback), per SURVEY.md §7.1.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from captionax.eval.bleu import corpus_bleu
from captionax.eval.cider import cider_score
from captionax.eval.meteor import meteor_corpus
from captionax.eval.rouge import rouge_l_corpus


def ids_to_text(ids: Sequence[int], vocab, tokenized: bool = False):
    """`cap_to_text_gt` semantics (/root/reference/utils.py:177-190)."""
    words = vocab.decode(ids)
    return words if tokenized else " ".join(words)


def logits_to_text(logits: np.ndarray, vocab, tokenized: bool = False):
    """`cap_to_text` semantics (/root/reference/utils.py:161-174):
    argmax over the vocab axis, then decode."""
    ids = np.asarray(logits).argmax(axis=-1)
    return ids_to_text(ids, vocab, tokenized)


def clean_sentence(ids: Sequence[int], vocab) -> str:
    """`clean_sentence` semantics (/root/reference/utils.py:347-351):
    drop <s>, ',', <pad>, </s> but do NOT stop at </s>."""
    words = [vocab.i2w.get(int(i)) for i in ids]
    words = [w for w in words if w not in ("<s>", ",", "<pad>", "</s>")]
    return " ".join(w for w in words if w is not None)


def _bleu_suite(
    tok_hyps: List[List[str]], tok_refs: List[List[List[str]]]
) -> List[float]:
    return [
        corpus_bleu(tok_hyps, tok_refs, max_order=k)["bleu"] for k in (1, 2, 3, 4)
    ]


def metric_score(
    gt_caps: np.ndarray,
    pred_logits: np.ndarray,
    vocab,
) -> Dict[str, float]:
    """Batch metrics on teacher-forced logits vs gt ids.

    gt_caps: [B, T] int ids; pred_logits: [B, T, V] float logits.
    Returns {'bleu1'..'bleu4', 'meteor', 'rougeL', 'cider'}.
    """
    gt_caps = np.asarray(gt_caps)
    pred_ids = np.asarray(pred_logits).argmax(axis=-1)
    tok_hyps, tok_refs, hyp_strs, ref_strs = [], [], [], []
    for i in range(len(pred_ids)):
        hyp = vocab.decode(pred_ids[i])
        ref = vocab.decode(gt_caps[i])
        tok_hyps.append(hyp)
        tok_refs.append([ref])
        hyp_strs.append(" ".join(hyp))
        ref_strs.append(" ".join(ref))
    return _assemble(tok_hyps, tok_refs, hyp_strs, ref_strs)


def metric_score_test(
    gt_caps: np.ndarray,
    pred_ids: Sequence[int],
    vocab,
) -> Dict[str, float]:
    """Single decoded hypothesis (e.g. the best beam) vs a batch of gt refs,
    mirroring /root/reference/utils.py:284-334 (each ref is scored as its
    own image against the same hypothesis)."""
    gt_caps = np.asarray(gt_caps)
    hyp = vocab.decode(np.asarray(pred_ids))
    hyp_str = " ".join(hyp)
    tok_hyps, tok_refs, hyp_strs, ref_strs = [], [], [], []
    for i in range(len(gt_caps)):
        ref = vocab.decode(gt_caps[i])
        tok_hyps.append(hyp)
        tok_refs.append([ref])
        hyp_strs.append(hyp_str)
        ref_strs.append(" ".join(ref))
    return _assemble(tok_hyps, tok_refs, hyp_strs, ref_strs)


def _assemble(tok_hyps, tok_refs, hyp_strs, ref_strs) -> Dict[str, float]:
    bleu = _bleu_suite(tok_hyps, tok_refs)
    cider_refs = [[" ".join(r[0])] for r in tok_refs]
    cider_hyps = [" ".join(h) for h in tok_hyps]
    from captionax.eval.cider_native import cider_score_native

    cider, _ = cider_score_native(cider_hyps, cider_refs)
    return {
        "bleu1": bleu[0],
        "bleu2": bleu[1],
        "bleu3": bleu[2],
        "bleu4": bleu[3],
        "meteor": meteor_corpus(hyp_strs, ref_strs),
        "rougeL": rouge_l_corpus(hyp_strs, ref_strs),
        "cider": cider,
    }


class CaptionMetrics:
    """Stateful accumulator for eval loops: add batches, compute once.

    Computing CIDEr per accumulated corpus (not per training batch) both
    matches the metric's corpus-df design and keeps metrics off the TPU
    step path.
    """

    def __init__(self, vocab):
        self.vocab = vocab
        self.tok_hyps: List[List[str]] = []
        self.tok_refs: List[List[List[str]]] = []
        self.hyp_strs: List[str] = []
        self.ref_strs: List[str] = []

    def add_batch_ids(self, gt_caps: np.ndarray, pred_ids: np.ndarray) -> None:
        gt_caps = np.asarray(gt_caps)
        pred_ids = np.asarray(pred_ids)
        for i in range(len(pred_ids)):
            hyp = self.vocab.decode(pred_ids[i])
            ref = self.vocab.decode(gt_caps[i])
            self.tok_hyps.append(hyp)
            self.tok_refs.append([ref])
            self.hyp_strs.append(" ".join(hyp))
            self.ref_strs.append(" ".join(ref))

    def add_batch_logits(self, gt_caps, pred_logits) -> None:
        self.add_batch_ids(gt_caps, np.asarray(pred_logits).argmax(axis=-1))

    def compute(self) -> Dict[str, float]:
        if not self.tok_hyps:
            return {k: 0.0 for k in
                    ("bleu1", "bleu2", "bleu3", "bleu4", "meteor", "rougeL", "cider")}
        return _assemble(self.tok_hyps, self.tok_refs, self.hyp_strs, self.ref_strs)
