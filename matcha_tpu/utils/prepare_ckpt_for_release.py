"""Strip a training checkpoint to params-only for serving/release.

CLI:  python -m matcha_tpu.utils.prepare_ckpt_for_release \
          --input <ckpt_dir> --output docker/checkpoint
(reference: matcha/utils/prepare_ckpt_for_release.py — drops optimizer
state, keeps params + hyper-parameters.)
"""

from __future__ import annotations

import argparse

from matcha_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    strip_for_release,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    tree, cfg = load_checkpoint(args.input)
    save_checkpoint(args.output, strip_for_release(tree), cfg)
    print(f"stripped checkpoint → {args.output}")


if __name__ == "__main__":
    main()
