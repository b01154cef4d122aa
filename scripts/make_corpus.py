"""Generate a deterministic synthetic transcripts corpus (FIXTURES.md §1).

Usage: python scripts/make_corpus.py OUT.parquet [--n-convs 200]
       [--turns-low 5] [--turns-high 40] [--seed 42] [--skew-conv-turns 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out")
    p.add_argument("--n-convs", type=int, default=200)
    p.add_argument("--turns-low", type=int, default=5)
    p.add_argument("--turns-high", type=int, default=40)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--skew-conv-turns", type=int, default=0)
    args = p.parse_args(argv)
    from ocr_spark.fixtures import write_transcripts_parquet

    df = write_transcripts_parquet(
        args.out,
        n_convs=args.n_convs,
        turns_low=args.turns_low,
        turns_high=args.turns_high,
        seed=args.seed,
        skew_conv_turns=args.skew_conv_turns,
    )
    print(f"wrote {len(df)} turns / {df['conv_id'].nunique()} convs -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
