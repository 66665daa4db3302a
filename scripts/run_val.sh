#!/bin/bash
# Dev-eval: run inference against data/val_testing (the val split renamed as
# test) so the full inference+scoring path is exercised without touching the
# real test set.
bash scripts/run.sh --data_dir './data/val_testing/' "$@"
