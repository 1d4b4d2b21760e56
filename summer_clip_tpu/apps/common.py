"""Shared app plumbing: CLIP sessions with jitted encoders + feature extraction.

This is the L5-app support layer (SURVEY.md §1): where the reference calls
``clip.load(name, device)`` and loops ``encode_image`` per batch
(``clip_adapter/save_features.py:28-37``), apps here build a
:class:`ClipSession` — frozen Flax variables + jit-compiled encode closures —
and stream fixed-shape prefetched batches through it. With a mesh, batches
are sharded over the ``data`` axis (pjit-style SPMD feature extraction).
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from summer_clip_tpu.data.loader import Batch, prefetch_to_device
from summer_clip_tpu.models.clip import init_clip
from summer_clip_tpu.models.clip.convert import load_clip as load_clip_ckpt

__all__ = ["ClipSession", "create_clip_session", "extract_image_features", "resolve_dtype"]


def resolve_dtype(name: tp.Optional[str] = None):
    if name in (None, "auto"):
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "fp32": jnp.float32}[str(name)]


class ClipSession:
    """Frozen CLIP with jitted encode closures."""

    def __init__(self, model, cfg, variables, mesh: tp.Optional[jax.sharding.Mesh] = None):
        self.model = model
        self.cfg = cfg
        self.variables = variables
        self.mesh = mesh

        from summer_clip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

        mean = jnp.asarray(CLIP_MEAN)
        std = jnp.asarray(CLIP_STD)

        def prep(images):
            """uint8 batches normalize ON DEVICE (the host ships raw bytes —
            4x less host->device transfer; XLA fuses this into the stem)."""
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
                images = (images - mean) / std
            return images

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(variables, self._replicated)
            img_shard = NamedSharding(mesh, P("data", None, None, None))

            @jax.jit
            def encode_image(variables, images):
                images = jax.lax.with_sharding_constraint(images, img_shard)
                return model.apply(variables, prep(images), method=model.encode_image)

            @jax.jit
            def encode_image_preproj(variables, images):
                images = jax.lax.with_sharding_constraint(images, img_shard)
                return model.apply(variables, prep(images), method=model.encode_image_preproj)
        else:
            self._data_sharding = None

            @jax.jit
            def encode_image(variables, images):
                return model.apply(variables, prep(images), method=model.encode_image)

            @jax.jit
            def encode_image_preproj(variables, images):
                return model.apply(variables, prep(images), method=model.encode_image_preproj)

        @jax.jit
        def encode_text(variables, tokens):
            return model.apply(variables, tokens, method=model.encode_text)

        @jax.jit
        def encode_text_embeds(variables, embeds, lens):
            return model.apply(variables, embeds, lens, method=model.encode_text_embeds)

        self._encode_image = encode_image
        self._encode_image_preproj = encode_image_preproj
        self._encode_text = encode_text
        self._encode_text_embeds = encode_text_embeds

    # bound single-arg closures for methods-layer helpers ---------------------
    def encode_image(self, images) -> jax.Array:
        return self._encode_image(self.variables, jnp.asarray(images))

    def encode_image_preproj(self, images) -> jax.Array:
        return self._encode_image_preproj(self.variables, jnp.asarray(images))

    def vision_projection(self) -> np.ndarray:
        """(width, embed_dim) final vision projection W0 (ViT towers)."""
        return np.asarray(self.variables["params"]["visual"]["proj"], np.float32)

    def encode_text(self, tokens) -> jax.Array:
        return self._encode_text(self.variables, jnp.asarray(tokens))

    def encode_text_embeds(self, embeds, lens) -> jax.Array:
        return self._encode_text_embeds(self.variables, embeds, jnp.asarray(lens))

    @property
    def logit_scale(self) -> float:
        return float(np.exp(np.asarray(self.variables["params"]["logit_scale"])))

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim

    @property
    def input_size(self) -> int:
        return self.cfg.image_resolution

    def token_embedding_table(self) -> np.ndarray:
        """(vocab, width) CLIP token embeddings (prompt-learning substrate)."""
        return np.asarray(self.variables["params"]["text"]["token_embedding"]["embedding"])


def create_clip_session(model_name: str,
                        checkpoint_path: tp.Optional[str] = None,
                        dtype: tp.Optional[str] = None,
                        mesh: tp.Optional[jax.sharding.Mesh] = None,
                        logger: tp.Optional[tp.Any] = None,
                        remat: tp.Optional[bool] = None,
                        proj_path: tp.Optional[str] = None,
                        quant: tp.Optional[str] = None) -> ClipSession:
    """Build a session from a config: converted checkpoint if provided,
    otherwise randomly-initialized towers (smoke/synthetic runs).

    ``proj_path``: optional ``.npy`` with a (width, embed_dim) vision
    projection to swap into the tower — how a ProLIP-tuned W
    (apps/train_prolip.py) drops into any downstream workload.

    ``quant='int8'`` (config ``clip.quant``) selects the int8-MXU inference
    towers — an opt-in speed/accuracy trade (ops/int8.py, docs/KERNELS.md).
    """
    jdtype = resolve_dtype(dtype)
    if checkpoint_path and Path(checkpoint_path).exists():
        model, cfg, variables = load_clip_ckpt(checkpoint_path, dtype=jdtype, quant=quant)
        if logger:
            logger.log_info(f"Loaded CLIP weights from {checkpoint_path} ({cfg.name})")
    else:
        if checkpoint_path and logger:
            logger.log_info(f"WARNING: checkpoint {checkpoint_path} not found — random init")
        model, cfg, variables = init_clip(model_name, dtype=jdtype, remat=bool(remat),
                                          quant=quant)
    if proj_path:
        W = np.load(proj_path)
        old = variables["params"]["visual"].get("proj")
        assert old is not None, "proj swap is defined for ViT towers only"
        assert W.shape == old.shape, f"projection shape {W.shape} != tower {old.shape}"
        variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-safe copy
        variables["params"]["visual"]["proj"] = jnp.asarray(W, jnp.float32)
        if logger:
            logger.log_info(f"Swapped vision projection from {proj_path}")
    return ClipSession(model, cfg, variables, mesh=mesh)


def data_parallel_mesh(batch_size: int) -> tp.Optional[jax.sharding.Mesh]:
    """Shared trainer mesh policy: a ('data', 'model'=1) mesh over every
    visible device when the batch divides evenly, else single-device.
    Calls distributed_init() so multi-host pods rendezvous first."""
    from summer_clip_tpu.parallel import create_mesh, distributed_init

    distributed_init()
    n = len(jax.devices())
    return create_mesh(data=n, model=1) if (n > 1 and batch_size % n == 0) else None


def resolve_prompting(cfg, view) -> tp.Tuple[tp.Sequence[str], tp.Sequence[str]]:
    """(classes, templates): config overrides win, else the dataset's own."""
    prompting = cfg.get("prompting")
    templates = (prompting.get("templates") if prompting else None) or view.template
    classes = (prompting.get("classes") if prompting else None) or view.classes
    return classes, templates


def extract_image_features(session: ClipSession, batcher: tp.Iterable[Batch],
                           progress_fn: tp.Optional[tp.Callable[[int], None]] = None,
                           preproj: bool = False
                           ) -> tp.Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stream batches through encode_image -> (features (N,D), labels, indices).

    Padded tail rows are dropped via the batch mask. Device->host copies
    overlap the next batch's compute (features fetched asynchronously).
    ``preproj=True`` extracts pre-projection features (ProLIP substrate).
    """
    encode = session._encode_image_preproj if preproj else session._encode_image
    feats_parts: tp.List[jax.Array] = []
    labels_parts: tp.List[np.ndarray] = []
    index_parts: tp.List[np.ndarray] = []
    masks: tp.List[np.ndarray] = []
    n_done = 0
    for batch in prefetch_to_device(batcher, size=2):
        f = encode(session.variables, batch.images)
        feats_parts.append(f)  # stays on device; gathered at the end
        labels_parts.append(np.asarray(batch.labels))
        index_parts.append(np.asarray(batch.indices))
        masks.append(np.asarray(batch.mask))
        n_done += int(np.asarray(batch.mask).sum())
        if progress_fn:
            progress_fn(n_done)
    feats = np.concatenate([np.asarray(f, np.float32) for f in feats_parts])
    labels = np.concatenate(labels_parts)
    indices = np.concatenate(index_parts)
    mask = np.concatenate(masks)
    feats, labels, indices = feats[mask], labels[mask], indices[mask]
    order = np.argsort(indices, kind="stable")
    return feats[order], labels[order], indices[order]
