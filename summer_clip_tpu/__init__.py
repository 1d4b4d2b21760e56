"""summer_clip_tpu: a TPU-native (JAX/XLA/Pallas/pjit) CLIP-adaptation framework.

Brand-new implementation of the capabilities of ``myrachins/summer-clip``:
zero-shot CLIP evaluation, feature caching, CLIP-search image-attention,
Tip-Adapter, trainable adapters, prompt learning (CoOp / Gumbel / VQ /
AutoPrompt / FluentPrompt), and the ClipGPT language-model stack — designed
TPU-first: Flax towers compiled by XLA, Pallas kernels for the cache-attention
hot path, pjit/shard_map over device meshes for scale.
"""

__version__ = "0.1.0"
