#!/bin/bash
# Score dev-eval predictions against the val_testing GT (built on the fly
# from the annotations when the shipped file is absent).
CKPT=${1:-./checkpoints/hirest_joint_model}
GT=./data/val_testing/formated_moment_evaluation_gt.json
if [ ! -f "$GT" ]; then
  GT=/tmp/hirest_val_gt.json
  python -m hirest_tpu.eval.make_gt --split_json ./data/val_testing/all_data_test.json --out $GT
fi
python evaluate.py --task moment_retrieval --pred_data $CKPT/test_moment_retrieval_BEST.json \
  --gt_data ./data/val_testing/all_data_test.json
python evaluate.py --task moment_segmentation --pred_data $CKPT/test_moment_segmentation_BEST.json \
  --preprocess_moment_bounds --gt_data $GT
python evaluate.py --task step_captioning --pred_data $CKPT/test_step_captioning_BEST.json --gt_data $GT
