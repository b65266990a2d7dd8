#!/bin/bash
# Stage-2 SFT, Cambrian-1-13B (Vicuna-1.5-13B): unfreeze the decoder,
# lr 4e-5 (README.md:240-244). Hyperparams follow
# /root/reference/scripts/cambrian/finetune_cambrian_13b.sh: conversation v1,
# image_position 35, 10 in-LLM sampler layers stride 4, warmup 0.03.

export CKPT_NAME="cambrian-13b-finetune"

python -m cambrian_tpu.train.train \
    --model_name_or_path "${PRETRAIN_CKPT:?set PRETRAIN_CKPT to the stage-1 output dir}" \
    --version v1 \
    --data_path "${DATA_PATH:?set DATA_PATH to Cambrian7M jsonl}" \
    --image_folder "${IMAGE_FOLDER:?set IMAGE_FOLDER}" \
    --pretrain_mm_mlp_adapter "${PRETRAIN_ADAPTER:-./checkpoints/cambrian-13b-pretrain/mm_projector.bin}" \
    --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", "openai/clip-vit-large-patch14-336", "facebook/dinov2-giant-res378", "clip-convnext-XXL-multi-stage"]' \
    --vision_tower_aux_token_len_list '[576, 576, 576, 9216]' \
    --image_token_len 576 \
    --num_query_group 1 \
    --query_num_list '[576]' \
    --connector_depth 3 \
    --connector_only False \
    --num_of_vision_sampler_layers 10 \
    --start_of_vision_sampler_layers 0 \
    --stride_of_vision_sampler_layers 4 \
    --vision_hidden_size 1024 \
    --mm_projector_type sva \
    --image_position 35 \
    --model_max_length 2048 \
    --tune_mm_mlp_adapter False \
    --unfreeze_mm_vision_tower False \
    --bf16 True \
    --output_dir "./checkpoints/${CKPT_NAME}" \
    --num_train_epochs 1 \
    --per_device_train_batch_size 8 \
    --learning_rate 4e-5 \
    --mm_vision_sampler_lr 1e-5 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 2000 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_model 1 \
    --group_by_modality_length True
