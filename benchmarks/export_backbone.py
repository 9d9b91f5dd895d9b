"""Export the backbone subtree of a detector checkpoint as a
torchvision-format ``.pth`` (the warm-start transfer artifact — consumed
through the exact import path the reference uses for model-zoo weights,
``/root/reference/src/modules/resnet.py:245-255``).

Run from the repo root (copy to ``./_export_backbone_run.py`` when invoked
from a chain — scripts in subdirs don't see the package). CPU-safe: loading
and re-serializing params never touches the device.

    python _export_backbone_run.py --checkpoint /tmp/hb_models/ctw20.ckpt \
        --out /tmp/hb_models/backbone_ctw20.pth
"""

import argparse
import os

# applies the JAX_PLATFORMS env pin via jax.config before backend init
import db_text_minimal_tpu  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    opt = ap.parse_args()

    from db_text_minimal_tpu.train.checkpoints import load_params_any
    from db_text_minimal_tpu.utils.torch_port import save_backbone_pth

    state = load_params_any(opt.checkpoint)
    os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
    save_backbone_pth(opt.out, state["params"]["backbone"],
                      state["batch_stats"]["backbone"])
    print("wrote", opt.out)


if __name__ == "__main__":
    main()
