#!/usr/bin/env python
"""CLI entry point.

Usage (same surface as the reference runner `/root/reference/main.py:27-33`):

    python main.py --base_config configs/base.yaml \
                   --dataset_config configs/cs.yaml \
                   [--inspect_only] [--opts KEY VALUE ...]
"""

import argparse
import os
from pathlib import Path

# Honor JAX_PLATFORMS even where a sitecustomize pre-registers another
# backend (the env var alone is overridden there; the config update is
# authoritative — see DEV_NOTES.md "TPU notes").
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from aihab_clip_tpu.config import load_configs
from aihab_clip_tpu.runner import run


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--base_config", type=str, default="configs/base.yaml")
    p.add_argument("--dataset_config", type=str, default="configs/cs.yaml")
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    p.add_argument("--inspect_only", action="store_true",
                   help="Run data/transform inspection only")
    p.add_argument("--logger", type=str, default="auto",
                   choices=["auto", "wandb", "stdout", "off"])
    return p.parse_args()


def main():
    args = parse_args()
    here = Path(__file__).parent
    cfg = load_configs(args.base_config, args.dataset_config, args.opts,
                       anchors=(here, here.parent))
    run(cfg, inspect_only=args.inspect_only,
        config_file=Path(args.dataset_config).stem,
        logger_mode=args.logger)


if __name__ == "__main__":
    main()
