"""Regenerate the committed tiny-GRU checkpoint + goldens.

    python tests/fixtures/generate_goldens.py

Trains the tiny factual GRU on the committed fixture captions (CPU,
fixed seeds), writes the Orbax checkpoint into tests/fixtures/gru_ckpt/,
then records evaluation goldens: the evaluate-CLI metric dict and the
exact beam token ids for the test split.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from tests.fixtures.gru_fixture import CKPT_DIR, GOLDENS, flags  # noqa: E402


def main():
    if os.path.isdir(CKPT_DIR):
        shutil.rmtree(CKPT_DIR)

    from captionax.cli.train_gru import main as train_main

    train_main(flags() + ["--style", "factual"])

    from captionax.cli.evaluate import main as eval_main

    results = eval_main(flags() + ["--kind", "gru", "--styles", "factual"])

    # token-level goldens: the beam output ids on the test split
    from tests.test_checkpoint_goldens import beam_tokens_from_fixture

    beam_toks, greedy_toks = beam_tokens_from_fixture()
    goldens = {
        "metrics": {k: float(v) for k, v in results["factual"].items()},
        "beam_tokens": beam_toks,
        "greedy_tokens": greedy_toks,
    }
    with open(GOLDENS, "w") as f:
        json.dump(goldens, f, indent=1)
    print("wrote", GOLDENS)
    print(goldens["metrics"])


if __name__ == "__main__":
    main()
