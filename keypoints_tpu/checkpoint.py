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


# --- flax → torch conversion (the reverse direction) -------------------------

def _invert_leaf(leaf: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    """Exact inverse of :func:`_convert_leaf` on one flax leaf."""
    if leaf == "kernel":
        if value.ndim == 4:                      # HWIO → OIHW
            return "weight", np.transpose(value, (3, 2, 0, 1))
        if value.ndim == 2:                      # IO → OI
            return "weight", np.transpose(value, (1, 0))
        return "weight", value
    if leaf == "scale":                          # norm gain
        return "weight", value
    return leaf, value


def export_torch_state_dict(params: dict,
                            rename: Optional[dict[str, str]] = None) -> dict:
    """Nested flax params → flat torch-layout state dict (name → ndarray).

    The exact inverse of :func:`convert_torch_state_dict`: transposes conv
    kernels HWIO→OIHW and linear kernels IO→OI, renames ``kernel``/``scale``
    back to ``weight``. ``rename`` maps FLAX module-path prefixes to torch
    ones — i.e. the inversion (``{v: k for k, v in ...}``) of the map you
    would hand the forward converter. Lets a TPU-trained model round-trip
    into the reference's ``torch.save`` world (SURVEY.md §5 checkpoint/resume
    names torch state dicts as the reference format; [B:5] "same
    checkpoint-loadable weights" — this direction makes the loadability
    mutual). bf16 leaves are exported as float32.
    """
    rename = dict(sorted((rename or {}).items(), key=lambda kv: -len(kv[0])))
    out: dict = {}
    for path, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = [str(k.key) for k in path]
        arr = np.asarray(value)
        if arr.dtype.name == "bfloat16":         # no torch/numpy bridge
            arr = arr.astype(np.float32)
        leaf, arr = _invert_leaf(parts[-1], arr)
        name = ".".join(parts[:-1] + [leaf])
        for src, dst in rename.items():
            if name == src or name.startswith(src + "."):
                name = dst + name[len(src):]
                break
        out[name] = arr
    return out


def save_torch_checkpoint(path: str, params: dict,
                          rename: Optional[dict[str, str]] = None) -> None:
    """``torch.save`` the flax params as a torch-format state dict."""
    import torch
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_torch_state_dict(params, rename).items()}
    torch.save(sd, path)


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

    from keypoints_tpu.utils.platform import apply_platform
    apply_platform()      # $KEYPOINTS_TPU_PLATFORM — shape validation and
    # the export-torch restore allocate on the default backend otherwise,
    # grabbing the axon TPU mid-measurement (same rule as every other CLI)

    p = argparse.ArgumentParser(
        description="convert checkpoints between torch and Orbax formats")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="torch state dict -> Orbax params")
    c.add_argument("torch_path")
    c.add_argument("out_dir")
    c.add_argument("--rename", default=None,
                   help="JSON file mapping torch module prefixes to flax paths")
    c.add_argument("--preset", default=None,
                   help="validate converted shapes against this config preset")
    e = sub.add_parser("export-torch",
                       help="Orbax training checkpoint -> torch state dict")
    e.add_argument("checkpoint_dir", help="Orbax checkpoint dir (train CLI layout)")
    e.add_argument("out_path", help="output .pt file")
    e.add_argument("--preset", required=True,
                   help="config preset the checkpoint was trained with")
    e.add_argument("--override", nargs="*", default=[],
                   help="config overrides the checkpoint was trained with"
                        " (the restore template must match its shapes)")
    e.add_argument("--rename", default=None,
                   help="JSON file mapping FLAX module prefixes to torch paths"
                        " (the inversion of a convert-direction map)")
    args = p.parse_args(argv)

    rename = None
    if args.rename:
        with open(args.rename) as f:
            rename = json.load(f)

    if args.cmd == "convert":
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
        return

    # export-torch: restore the latest step, write params as a state dict
    import jax
    from keypoints_tpu.configs import apply_overrides, get_config
    from keypoints_tpu.training import init_state
    cfg = apply_overrides(get_config(args.preset), args.override)
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = make_manager(args.checkpoint_dir)
    step, restored = restore_latest(mgr, state._asdict())
    if step is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir!r}")
    save_torch_checkpoint(args.out_path, restored["params"], rename)
    print(f"wrote torch state dict (step {step}) to {args.out_path}")


if __name__ == "__main__":
    _cli()
