"""Training entry point: ``python -m spatiotemporal_variable_separation_tpu.cli.main``
(reference ``python -m var_sep.main`` equivalent, ``var_sep/main.py:49-162``)."""

from __future__ import annotations

import os


def main(argv=None):
    from spatiotemporal_variable_separation_tpu.cli.options import (
        build_parser,
        config_from_args,
    )
    from spatiotemporal_variable_separation_tpu.train.loop import run_training

    args = build_parser().parse_args(argv)
    cfg = config_from_args(args).validate()
    os.makedirs(cfg.xp_dir, exist_ok=True)
    # params.json dump (main.py:104-106) — eval CLIs reload this.
    cfg.save(os.path.join(cfg.xp_dir, "params.json"))
    run_training(cfg)


if __name__ == "__main__":
    main()
