#!/usr/bin/env python
"""Training entry point (counterpart of train_lightning.py).

Usage:
    python train.py [config.yaml ...] [key.sub=value ...]

Configs merge left-to-right on top of configs/base.yaml; trailing
key=value pairs are dotlist overrides (same layering as the reference,
train_lightning.py:96-103).
"""

import os
import sys
import time

n_thread = 4
for var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS",
            "VECLIB_MAXIMUM_THREADS", "OPENBLAS_NUM_THREADS"):
    os.environ.setdefault(var, str(n_thread))


def parse_args(argv):
    from lara_tpu.config import parse_cli

    return parse_cli(argv)


def main(argv=None):
    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from lara_tpu.config import load_config
    from lara_tpu.train.loop import Trainer

    paths, overrides = parse_args(argv if argv is not None else sys.argv[1:])
    base = os.path.join(os.path.dirname(__file__), "configs", "base.yaml")
    cfg = load_config(base, *paths, overrides=overrides)

    if cfg.train.detect_anomaly:
        # NaN sanitizer (train_lightning.py:30 equivalent)
        import jax

        jax.config.update("jax_debug_nans", True)

    trainer = Trainer(cfg)
    t0 = time.time()
    stats = trainer.fit()
    dt = time.time() - t0
    print(f"training finished in {dt/3600:.2f} h; final stats: {stats}")


if __name__ == "__main__":
    main()
