"""stylish_tts_tpu — a TPU-native TTS training framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of
Stylish-TTS (reference: /root/reference): multi-stage single-speaker
TTS training (alignment -> acoustic -> textual -> duration), cached
forced-alignment and pitch, duration-bucketed static-shape batching,
an iSTFT GAN vocoder, and a StableHLO-exportable inference graph.

Design stance (TPU-first, not a port):
  * pure-functional flax models, one jit'd train step per stage
  * STFT/iSTFT as framed DFT matmuls on the MXU
  * CTC + Viterbi forced alignment as batched lax.scan (replaces k2)
  * data parallel GAN step via jax.sharding.Mesh + NamedSharding
  * static bucket shapes (duration bins) instead of OOM probing
"""

__version__ = "0.1.0"
