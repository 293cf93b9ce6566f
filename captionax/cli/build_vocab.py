"""Build and pickle a vocabulary (build_vocab.py / build_vocab_cc.py
equivalents, /root/reference/build_vocab.py:89-93).

    python -m captionax.cli.build_vocab --out data/vocab.pkl \
        --factual data/factual_train.txt --humour ... --romantic ...
    python -m captionax.cli.build_vocab --out data/vocab_CC.pkl \
        --cc data/200_conceptual_train.txt
"""

from __future__ import annotations

import argparse
import pickle

from captionax.core.vocab import build_vocab, extract_factual_caption_lines
from captionax.data.cc import load_cc_captions
from captionax.data.flickr import load_styled_captions


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--factual", default="")
    p.add_argument("--humour", default="")
    p.add_argument("--romantic", default="")
    p.add_argument("--cc", default="", help="CC caption file (5-space format)")
    p.add_argument("--min-count", type=int, default=2)
    args = p.parse_args(argv)

    styled = []
    for path in (args.humour, args.romantic):
        if path:
            styled.append(load_styled_captions(path))
    factual = None
    if args.factual:
        factual = extract_factual_caption_lines(args.factual)
    if args.cc:
        # CC vocab treats all captions as one styled corpus with min-count
        # applied (build_vocab_cc.py:29-58 uses count >= 2 over everything)
        caps = [cap for _, cap, _ in load_cc_captions(args.cc)]
        factual = (factual or []) + caps
    vocab = build_vocab(factual, styled, min_count_factual=args.min_count)
    with open(args.out, "wb") as f:
        pickle.dump(vocab, f)
    print(f"wrote {args.out}: {len(vocab)} entries")
    return vocab


if __name__ == "__main__":
    main()
