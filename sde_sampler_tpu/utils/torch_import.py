"""Convert reference (PyTorch) checkpoints into this repo's param pytrees.

Lets a user of the reference `sde_sampler` bring a trained control network
across: the reference stores `generative_ctrl` / `inference_ctrl` as torch
state_dicts (reference solver/base.py:199-216 save_attrs protocol) whose
module names map 1:1 onto our flax modules (models/mlp.py mirrors the
reference architectures):

    torch key                         flax path
    --------------------------------  -------------------------------
    input_embed.weight                input_embed.kernel  (transposed)
    timestep_embed.timestep_phase     timestep_embed.timestep_phase
    timestep_embed.hidden_layer.K.*   timestep_embed.hidden_K.*
    hidden_layer.K.{weight,bias}      hidden_K.{kernel,bias}
    out_layer.{weight,bias}           out.{kernel,bias}

`convert_state_dict` performs that mapping generically (works for
TimeEmbed, FourierMLP, FeedForward and the reparam wrappers' base_model/
score_model nesting); torch Linear weights are (out, in) and transpose to
flax (in, out) kernels. See scripts/import_torch_ckpt.py for the CLI.
"""
from __future__ import annotations

import numpy as np

__all__ = ["convert_state_dict", "load_params_file"]


def _to_numpy(val) -> np.ndarray:
    if hasattr(val, "detach"):  # torch tensor
        val = val.detach().cpu().numpy()
    return np.asarray(val, dtype=np.float32)


def _rename(parts: list[str]) -> list[str]:
    """Apply the torch→flax naming map to one dotted key."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "hidden_layer":
            if i + 1 >= len(parts) or not parts[i + 1].isdigit():
                raise ValueError(
                    f"expected an index after 'hidden_layer' in {parts}"
                )
            out.append(f"hidden_{parts[i + 1]}")
            i += 2
        elif p == "out_layer":
            out.append("out")
            i += 1
        elif p == "weight":
            out.append("kernel")
            i += 1
        else:
            out.append(p)
            i += 1
    return out


def convert_state_dict(state_dict: dict) -> dict:
    """Torch state_dict (flat dotted keys) → nested flax param dict."""
    tree: dict = {}
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        parts = _rename(key.split("."))
        if parts[-1] == "kernel":
            if arr.ndim != 2:
                raise ValueError(
                    f"{key}: expected a 2-D Linear weight, got {arr.shape}"
                )
            arr = arr.T  # torch (out, in) → flax (in, out)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def load_params_file(path) -> dict:
    """Load a converted params pytree (pickle) written by
    scripts/import_torch_ckpt.py (or any pickled nested dict of arrays)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def merge_params(init_params: dict, loaded: dict) -> dict:
    """Replace top-level modules of a freshly initialized param tree with
    imported subtrees, validating structure and shapes."""
    import jax
    import jax.numpy as jnp

    out = dict(init_params)
    for name, sub in loaded.items():
        if name not in out:
            raise KeyError(
                f"imported params have module {name!r}; this solver has "
                f"{sorted(out)}"
            )
        ref_shapes = jax.tree_util.tree_map(
            lambda a: tuple(a.shape), out[name]
        )
        new_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), sub)
        if ref_shapes != new_shapes:
            raise ValueError(
                f"imported {name!r} does not match the model architecture:\n"
                f"  model:    {ref_shapes}\n  imported: {new_shapes}"
            )
        out[name] = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), sub
        )
    return out
