"""Uniformly average N checkpoints into one.

CLI:  python -m matcha_tpu.utils.average_checkpoints \
          --inputs ckpt_a ckpt_b ... --output averaged_ckpt
(reference: matcha/utils/average_checkpoints.py)
"""

from __future__ import annotations

import argparse

from matcha_tpu.train.checkpoint import (
    average_checkpoints,
    load_checkpoint,
    save_checkpoint,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inputs", nargs="+", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    trees = []
    cfg = None
    for path in args.inputs:
        tree, cfg = load_checkpoint(path)
        trees.append(tree)
    avg = average_checkpoints(trees)
    save_checkpoint(args.output, avg, cfg)
    print(f"averaged {len(trees)} checkpoints → {args.output}")


if __name__ == "__main__":
    main()
