"""Test configuration: force an 8-device CPU platform before JAX loads so
multi-device sharding tests run anywhere (SURVEY.md §4)."""

import os

# the image's sitecustomize registers the axon TPU plugin and prepends
# "axon" to jax_platforms, overriding JAX_PLATFORMS=cpu from the
# environment — pin the config directly before any backend initializes
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_vocab():
    from captionax.core.vocab import build_vocab

    factual = [
        "A child in a pink dress is climbing up stairs .",
        "A child in a pink dress is going into a cabin .",
        "a dog runs in the grass .",
        "a dog runs after a ball .",
    ]
    humor = ["a dog runs in the grass chasing his dreams ."]
    romantic = ["a child climbs stairs toward a loving home ."]
    return build_vocab(factual, [humor, romantic])


@pytest.fixture(scope="session")
def ref_vocab():
    """The shipped 9,684-entry vocab.pkl when the reference is mounted."""
    path = "/root/reference/data/vocab.pkl"
    if not os.path.exists(path):
        pytest.skip("reference vocab.pkl not available")
    from captionax.core.vocab import load_vocab_pickle

    return load_vocab_pickle(path)
