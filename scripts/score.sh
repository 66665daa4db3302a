#!/bin/bash
# Score all four tasks against the test split GT.
CKPT=${1:-./checkpoints/hirest_joint_model}
python evaluate.py --task moment_retrieval --pred_data $CKPT/test_moment_retrieval_BEST.json
python evaluate.py --task moment_segmentation --pred_data $CKPT/test_moment_segmentation_BEST.json --preprocess_moment_bounds
python evaluate.py --task step_captioning --pred_data $CKPT/test_step_captioning_BEST.json
