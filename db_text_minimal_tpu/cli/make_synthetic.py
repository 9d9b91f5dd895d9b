"""Generate a synthetic TotalText-format dataset for demos/tests.

Usage::

    python -m db_text_minimal_tpu.cli.make_synthetic out_dir \
        [--n_train 8] [--n_test 4] [--size 640] [--seed 0]
"""

from __future__ import annotations

import argparse

import yaml

from ..data.synthetic import generate


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--n_train", type=int, default=8)
    parser.add_argument("--n_test", type=int, default=4)
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    section = generate(args.out_dir, n_train=args.n_train,
                       n_test=args.n_test, size=args.size, seed=args.seed)
    print(yaml.safe_dump({"data": {"synthetic": section},
                          "dataset": {"name": "synthetic"}},
                         sort_keys=False))


if __name__ == "__main__":
    main()
