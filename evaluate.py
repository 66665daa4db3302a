#!/usr/bin/env python
"""CLI-parity wrapper: `python evaluate.py --task ... --pred_data ...`
(same flags as the reference evaluator)."""

from hirest_tpu.eval.cli import main

if __name__ == "__main__":
    main()
