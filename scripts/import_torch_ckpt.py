"""Import a reference (PyTorch) sde_sampler checkpoint into this framework.

The reference stores checkpoints as torch pickles whose `generative_ctrl`
(and optionally `inference_ctrl`) entries are module state_dicts
(reference solver/base.py:199-216). This converts those state_dicts into
flax param pytrees (utils/torch_import.py) and writes a params pickle that
any solver accepts through the `params_file=` config knob:

    python scripts/import_torch_ckpt.py ref_ckpt.pt converted.pkl
    python scripts/main.py target=... solver=... params_file=converted.pkl

Requires torch (present in this image) to unpickle the reference file.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.torch_import import convert_state_dict  # noqa: E402

CTRL_KEYS = ("generative_ctrl", "inference_ctrl")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", help="reference torch checkpoint (.pt)")
    parser.add_argument("out", help="output params pickle (.pkl)")
    args = parser.parse_args()

    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    converted = {}
    for key in CTRL_KEYS:
        if isinstance(ckpt.get(key), dict):
            converted[key] = convert_state_dict(ckpt[key])
    if not converted:
        raise SystemExit(
            f"no {CTRL_KEYS} state_dicts found in {args.ckpt}; "
            f"top-level keys: {sorted(ckpt)}"
        )
    with open(args.out, "wb") as f:
        pickle.dump(converted, f)
    print(f"wrote {sorted(converted)} to {args.out}")


if __name__ == "__main__":
    main()
