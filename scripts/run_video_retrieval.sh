#!/bin/bash
python inference_video_retrieval.py \
        --data_dir './data/splits/' \
        --video_feature_dir './data/eva_clip_features' \
        --video_retrieval_model clip_g \
        --n_model_frames 32 \
        "$@"
python evaluate.py --task video_retrieval --pred_data VR_results/clip_g_VR_32frames_avgpool.json
