#!/usr/bin/env python
"""Reference-compatible CLI entry (``tf_train.py`` flags, SURVEY.md §2.1).

Thin shim over :mod:`iaf_tpu.cli` so both invocations work:

    python train.py --logdir D --hpconfig k=v,... --mode train
    iaf-train      --logdir D --hpconfig k=v,... --mode train   (pip install)
"""

from iaf_tpu.cli import main

if __name__ == "__main__":
    main()
