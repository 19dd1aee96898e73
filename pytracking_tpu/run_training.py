"""CLI: run a training recipe.

Re-design of reference `ltr/run_training.py` (run_training:17-39):

    python -m pytracking_tpu.run_training dimp dimp50
"""

from __future__ import annotations

import argparse
import importlib

from pytracking_tpu.training.settings import Settings


def run_training(train_module: str, train_name: str, **kwargs):
    print(f"Training: {train_module} {train_name}")
    settings = Settings(module_name=train_module, script_name=train_name,
                        project_path=f"{train_module}/{train_name}")
    expr = importlib.import_module(
        f"pytracking_tpu.training.train_settings.{train_module}.{train_name}")
    return expr.run(settings, **kwargs)


def main():
    parser = argparse.ArgumentParser(description="Run a training recipe.")
    parser.add_argument("train_module", type=str)
    parser.add_argument("train_name", type=str)
    parser.add_argument("--max_epochs", type=int, default=None)
    args = parser.parse_args()
    kwargs = {}
    if args.max_epochs is not None:
        kwargs["max_epochs"] = args.max_epochs
    run_training(args.train_module, args.train_name, **kwargs)


if __name__ == "__main__":
    main()
