"""Generate a synthetic TotalText-format dataset for demos/tests.

Usage::

    python -m db_text_minimal_tpu.cli.make_synthetic out_dir \
        [--n_train 8] [--n_test 4] [--size 640] [--seed 0] [--hard]

``--hard`` selects the quality-parity proxy benchmark generator (curved +
rotated + small + ignore-tagged words over distractor clutter); its default
split is 1600/400 at seed 7 — the committed ``demo/hard_bench`` GT pickles
correspond to exactly that invocation.
"""

from __future__ import annotations

import argparse

import yaml

from ..data.synthetic import generate, generate_hard, generate_hard_ctw


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--n_train", type=int, default=None)
    parser.add_argument("--n_test", type=int, default=None)
    parser.add_argument("--size", type=int, default=640)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--hard", action="store_true",
                        help="hard benchmark generator (see module doc)")
    parser.add_argument("--ctw", action="store_true",
                        help="CTW1500-format LINE-LEVEL benchmark "
                             "(polygon-mode quality proxy; 1600/400 at "
                             "seed 11)")
    args = parser.parse_args(argv)
    gen = (generate_hard_ctw if args.ctw
           else generate_hard if args.hard else generate)
    defaults = ((1600, 400, 11) if args.ctw
                else (1600, 400, 7) if args.hard else (8, 4, 0))
    section = gen(
        args.out_dir,
        n_train=args.n_train if args.n_train is not None else defaults[0],
        n_test=args.n_test if args.n_test is not None else defaults[1],
        size=args.size,
        seed=args.seed if args.seed is not None else defaults[2])
    name = "ctw1500" if args.ctw else "synthetic"
    print(yaml.safe_dump({"data": {name: section},
                          "dataset": {"name": name}},
                         sort_keys=False))


if __name__ == "__main__":
    main()
