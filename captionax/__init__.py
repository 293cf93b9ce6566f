"""captionax — TPU-native style-conditioned image captioning framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
the PyTorch reference ``zacharie12/Hypernet-image-captioning`` ("Caption-HN"):

- CNN image encoders (ResNet family) producing region features,
- recurrent caption decoders (GRU / LSTM cells + Bahdanau attention) written
  as pure functions over weight pytrees,
- a style/domain-conditioned **hypernetwork** that synthesizes the decoder's
  recurrent-cell weights on device,
- teacher-forced / greedy / sampled / beam decoding as fixed-shape
  ``lax.scan`` programs plus fused Pallas TPU kernels for the decode step,
- FlickrStyle and Conceptual Captions data pipelines,
- BLEU / METEOR / ROUGE-L / CIDEr evaluation with score parity against the
  reference's vendored scorers,
- a LaBERT-style masked-LM transformer baseline and a CATR-style
  encoder-decoder baseline,
- pjit/shard_map data-parallel training over a TPU mesh.

Subpackages
-----------
core      vocabulary, tokenization, configuration
data      dataset parsers, image pipeline, fixed-shape batching
models    encoders, attention, decoder cells, hypernets, transformers
decode    teacher-forced scoring, greedy / sample / beam search
ops       Pallas TPU kernels for the hot decode path
parallel  mesh construction and sharding rules
train     optimizer / train-state / losses / checkpointing / logging
eval      caption metrics (BLEU, METEOR, ROUGE-L, CIDEr) and tokenizers
cli       entry points mirroring the reference's train_*/test_* scripts
"""

__version__ = "0.1.0"
