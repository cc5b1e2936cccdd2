"""Resume a training run from its latest snapshot into a new dump dir.

Usage:
  python benchmarks/resume_run.py --from benchmarks/validation/RUN \
      --dump benchmarks/validation/RUN_cont --n-itr 1600

Builds the trainer from the source run's params.json, restores the
latest snapshot (utils/checkpoints.py resume semantics,
meta_trainer.py:30-33 analog), and continues training into a fresh
directory so the original artifacts stay untouched.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", required=True)
    ap.add_argument("--dump", required=True)
    ap.add_argument("--n-itr", type=int, default=None,
                    help="new total iteration count (default: config's)")
    args = ap.parse_args()

    from promp_tpu.run import build, ensure_backend, enable_compilation_cache
    from promp_tpu.utils import logger
    from promp_tpu.utils.checkpoints import resume_trainer
    from promp_tpu.run import ClassEncoder

    with open(os.path.join(args.src, "params.json")) as f:
        config = json.load(f)
    if args.n_itr is not None:
        config["n_itr"] = args.n_itr

    ensure_backend()
    enable_compilation_cache()
    logger.configure(
        dir=args.dump,
        format_strs=config.get("log_formats", ["stdout", "log", "csv"]),
        snapshot_mode=config.get("snapshot_mode", "last"),
        snapshot_gap=config.get("snapshot_gap", 10),
    )
    with open(os.path.join(logger.get_dir(), "params.json"), "w") as f:
        json.dump(config, f, cls=ClassEncoder, indent=1)

    trainer = build(config)
    start = resume_trainer(trainer, args.src)
    print(f"resumed from {args.src} at itr {start}", flush=True)
    trainer.train()


if __name__ == "__main__":
    main()
