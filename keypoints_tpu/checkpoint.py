"""Checkpointing: Orbax-managed native checkpoints + torch state-dict converter.

SURVEY.md §5 "Checkpoint/resume" — the reference saves ``torch.save`` state
dicts; the rebuild (a) checkpoints ``{params, opt_state, step}`` with Orbax
(atomic writes, ``max_to_keep``, automatic resume-from-latest [B:5]), and
(b) loads torch-format checkpoints through :func:`convert_torch_state_dict`
so reference-trained weights drop in ("same checkpoint-loadable weights",
[B:5]).

Torch layout conventions handled by the converter:
* ``Conv2d.weight``   (O, I, kH, kW)  → flax ``kernel`` (kH, kW, I, O)
* ``Linear.weight``   (O, I)          → flax ``kernel`` (I, O)
* ``GroupNorm.weight/bias``           → flax ``scale``/``bias``
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# --- Orbax native checkpoints ----------------------------------------------

def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(directory, options=options)


def save(manager: ocp.CheckpointManager, step: int, state: Any) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_latest(manager: ocp.CheckpointManager,
                   template: Any) -> tuple[Optional[int], Any]:
    """→ (step, state) from the newest checkpoint, or (None, template)."""
    step = manager.latest_step()
    if step is None:
        return None, template
    state = manager.restore(step, args=ocp.args.StandardRestore(template))
    return step, state


# --- torch → flax conversion ------------------------------------------------

def _convert_leaf(key_parts: list[str], value: np.ndarray) -> tuple[str, np.ndarray]:
    """Map one torch state-dict entry to (flax leaf name, transposed array)."""
    leaf = key_parts[-1]
    if leaf == "weight":
        if value.ndim == 4:                      # Conv2d OIHW → HWIO
            return "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:                      # Linear OI → IO
            return "kernel", np.transpose(value, (1, 0))
        return "scale", value                    # norm gain
    if leaf == "bias":
        return "bias", value
    return leaf, value


def convert_torch_state_dict(state_dict: dict,
                             rename: Optional[dict[str, str]] = None) -> dict:
    """Torch ``state_dict`` (name → tensor/ndarray) → nested flax params dict.

    ``rename`` optionally maps torch module-path prefixes to flax ones before
    nesting (e.g. ``{"encoder.layers.0": "encoder.Conv_0"}``); matching is
    longest-prefix-first on '.'-separated paths.
    """
    rename = dict(sorted((rename or {}).items(), key=lambda kv: -len(kv[0])))
    out: dict = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(getattr(tensor, "detach", lambda: tensor)().numpy()
                         if hasattr(tensor, "numpy") else tensor)
        for src, dst in rename.items():
            if name == src or name.startswith(src + "."):
                name = dst + name[len(src):]
                break
        parts = name.split(".")
        leaf_name, arr = _convert_leaf(parts, arr)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf_name] = arr
    return out


def load_torch_checkpoint(path: str,
                          rename: Optional[dict[str, str]] = None) -> dict:
    """Load a ``torch.save``d checkpoint file into flax params (CPU torch)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return convert_torch_state_dict(obj, rename)


def assert_tree_shapes_match(converted: dict, reference: dict) -> None:
    """Raise with a readable diff if converted params don't line up."""
    def flat(tree):
        return {"/".join(str(k.key) for k in path): v.shape
                for path, v in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    ref_flat = flat(reference)
    got_flat = flat(converted)
    missing = sorted(set(ref_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(ref_flat))
    bad = sorted(k for k in set(ref_flat) & set(got_flat)
                 if tuple(ref_flat[k]) != tuple(got_flat[k]))
    if missing or extra or bad:
        lines = [f"missing: {missing}", f"extra: {extra}",
                 *(f"shape {k}: got {got_flat[k]} want {ref_flat[k]}"
                   for k in bad)]
        raise ValueError("converted params mismatch:\n" + "\n".join(lines))


# --- CLI: python -m keypoints_tpu.checkpoint convert <torch.pt> <out_dir> ---

def _cli(argv=None):
    import argparse
    import json

    p = argparse.ArgumentParser(
        description="convert a torch checkpoint to an Orbax params checkpoint")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="torch state dict -> Orbax params")
    c.add_argument("torch_path")
    c.add_argument("out_dir")
    c.add_argument("--rename", default=None,
                   help="JSON file mapping torch module prefixes to flax paths")
    c.add_argument("--preset", default=None,
                   help="validate converted shapes against this config preset")
    args = p.parse_args(argv)

    rename = None
    if args.rename:
        with open(args.rename) as f:
            rename = json.load(f)
    params = load_torch_checkpoint(args.torch_path, rename)
    if args.preset:
        import jax
        from keypoints_tpu.configs import get_config
        from keypoints_tpu.training import init_state
        ref = init_state(get_config(args.preset),
                         jax.random.PRNGKey(0)).params
        assert_tree_shapes_match(params, ref)
        print(f"shapes validated against preset {args.preset!r}")
    mgr = make_manager(args.out_dir, max_to_keep=1)
    save(mgr, 0, {"params": params})
    mgr.wait_until_finished()
    print(f"wrote Orbax checkpoint to {args.out_dir} (step 0)")


if __name__ == "__main__":
    _cli()
