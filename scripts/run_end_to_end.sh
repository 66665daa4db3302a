#!/bin/bash
# Staged MR -> MS -> SC inference over the test split.
bash scripts/run.sh --end_to_end "$@"
