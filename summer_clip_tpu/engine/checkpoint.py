"""Checkpointing with the reference's trainable-params-only split.

The reference saves (a) adapter checkpoints that strip the frozen CLIP
weights (``clip_adapter/train_adapter.py:196-210``), (b) ClipGPT step
checkpoints holding only the adapter state + a model-config yaml for
reconstruction (``clip_prompt/train_gpt.py:23-39``), and (c) human-readable
yaml prompt checkpoints. Here:

- param pytrees serialize via ``flax.serialization`` msgpack,
- ``save_trainable`` filters a pytree by a path predicate, so frozen tower
  weights never hit disk,
- optimizer state saves alongside, and a ``meta.yaml`` records the config
  used to rebuild the model (eval apps re-instantiate from it, mirroring
  ``eval_adapter.py:51-56``).
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import yaml
from flax import serialization

__all__ = [
    "save_pytree", "load_pytree", "filter_tree", "merge_tree",
    "save_checkpoint", "load_checkpoint",
]


def save_pytree(path: tp.Union[str, Path], tree: tp.Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(tree))


def load_pytree(path: tp.Union[str, Path], target: tp.Any = None) -> tp.Any:
    data = Path(path).read_bytes()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def _path_names(path) -> tp.Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def filter_tree(tree: tp.Any, keep: tp.Callable[[tp.Tuple[str, ...]], bool]) -> dict:
    """Nested-dict subset of ``tree`` whose paths satisfy ``keep``."""
    out: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        names = _path_names(path)
        if not keep(names):
            continue
        cur = out
        for n in names[:-1]:
            cur = cur.setdefault(n, {})
        cur[names[-1]] = leaf
    return out


def merge_tree(base: tp.Any, overlay: dict) -> tp.Any:
    """Return ``base`` with leaves present in ``overlay`` replaced."""
    def rec(b, o):
        if isinstance(o, dict) and isinstance(b, dict):
            out = dict(b)
            for k, v in o.items():
                out[k] = rec(b[k], v) if k in b else v
            return out
        return o
    return rec(base, overlay)


def save_checkpoint(ckpt_dir: tp.Union[str, Path], *, params: tp.Any = None,
                    opt_state: tp.Any = None, meta: tp.Optional[dict] = None,
                    keep: tp.Optional[tp.Callable[[tp.Tuple[str, ...]], bool]] = None,
                    step: tp.Optional[int] = None) -> Path:
    """Save {model.ckpt, optimizer.ckpt, meta.yaml} under ckpt_dir[/step_N]."""
    ckpt_dir = Path(ckpt_dir)
    if step is not None:
        ckpt_dir = ckpt_dir / f"step_{step}"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if params is not None:
        to_save = filter_tree(params, keep) if keep else params
        save_pytree(ckpt_dir / "model.ckpt", to_save)
    if opt_state is not None:
        save_pytree(ckpt_dir / "optimizer.ckpt", opt_state)
    if meta is not None:
        (ckpt_dir / "meta.yaml").write_text(yaml.safe_dump(meta, sort_keys=False))
    return ckpt_dir


def load_checkpoint(ckpt_dir: tp.Union[str, Path], *, params_target: tp.Any = None,
                    opt_target: tp.Any = None) -> dict:
    """Load whatever exists in a checkpoint dir; trainable-only checkpoints
    are merged into ``params_target`` when provided."""
    ckpt_dir = Path(ckpt_dir)
    out: dict = {}
    model_path = ckpt_dir / "model.ckpt"
    if model_path.exists():
        saved = load_pytree(model_path)
        out["params"] = merge_tree(params_target, saved) if params_target is not None else saved
    opt_path = ckpt_dir / "optimizer.ckpt"
    if opt_path.exists():
        out["opt_state"] = (load_pytree(opt_path, opt_target)
                            if opt_target is not None else load_pytree(opt_path))
    meta_path = ckpt_dir / "meta.yaml"
    if meta_path.exists():
        out["meta"] = yaml.safe_load(meta_path.read_text())
    return out


# ---------------------------------------------------------------------------
# Orbax backend (optional): multi-host-safe async checkpointing for large
# training runs (train_gpt at scale). The msgpack path above remains the
# default for small trainable-only artifacts.
# ---------------------------------------------------------------------------

def save_orbax(ckpt_dir: tp.Union[str, Path], tree: tp.Any) -> Path:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(ckpt_dir: tp.Union[str, Path], target: tp.Any = None) -> tp.Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(Path(ckpt_dir).resolve(), target=target)
    return ckptr.restore(Path(ckpt_dir).resolve())
