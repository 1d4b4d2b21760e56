"""Model zoo: Flax CLIP towers, GPT-2/ClipGPT, tokenizers."""
