"""aihab-clip-tpu: a TPU-native (JAX / Flax / pjit / Pallas) CLIP habitat
classification framework with the capabilities of `WhiteGiveFive/aihab-clip`.

Layer map (bottom -> top), mirroring the reference's implicit layering
(see SURVEY.md §1):

  config        two-layer YAML config with CLI / dotted-path overrides
  taxonomy      L3/L2 habitat label spaces + converters
  templates     prompt ensembles (flat / hierarchical / descriptive)
  tokenizer     byte-level BPE (exact CLIP vocab), host-side
  models        Flax CLIP core (ViT, text transformer, ModifiedResNet,
                SigLIP-style towers) with a first-class pre-projection API
  ops           device compute: fused preprocessing, attention, metrics
  data          CSV-indexed dataset, bulk uint8 load, splits, few-shot
  cache         pre-projection feature cache + embedding cache
  train         ProLIP projector tuning + PEFT partial-unfreeze fine-tune
  parallel      mesh / sharding helpers (dp + tp over ICI)
  utils         checkpointing, logging, profiling
  tools         sweep launcher, embedding vis, outlier scoring
"""

__version__ = "0.1.0"
