#!/bin/bash
# Score dev-eval predictions against the val_testing GT.
CKPT=${1:-./checkpoints/hirest_joint_model}
python evaluate.py --task moment_retrieval --pred_data $CKPT/test_moment_retrieval_BEST.json \
  --gt_data ./data/val_testing/all_data_test.json
python evaluate.py --task moment_segmentation --pred_data $CKPT/test_moment_segmentation_BEST.json \
  --preprocess_moment_bounds --gt_data ./data/evaluation/formatted_moment_evaluation_gt_val.json
python evaluate.py --task step_captioning --pred_data $CKPT/test_step_captioning_BEST.json \
  --gt_data ./data/evaluation/formatted_moment_evaluation_gt_val.json
