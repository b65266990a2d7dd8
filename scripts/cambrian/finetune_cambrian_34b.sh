#!/bin/bash
# Stage-2 SFT, Cambrian-1-34B (Hermes-2-Yi-34B): global bs 1024, lr 2e-5
# (README.md:240-249). Hyperparams follow
# /root/reference/scripts/cambrian/finetune_cambrian_34b.sh: chatml_direct,
# image_position 87, 9 in-LLM sampler layers stride 7. 34B needs tensor
# parallelism on small slices (SURVEY.md §7 hard-part 7): mesh_model 4 puts
# TP on the innermost ICI axis; fsdp absorbs the rest.

export CKPT_NAME="cambrian-34b-finetune"

python -m cambrian_tpu.train.train \
    --model_name_or_path "${PRETRAIN_CKPT:?set PRETRAIN_CKPT to the stage-1 output dir}" \
    --version chatml_direct \
    --data_path "${DATA_PATH:?set DATA_PATH to Cambrian7M jsonl}" \
    --image_folder "${IMAGE_FOLDER:?set IMAGE_FOLDER}" \
    --pretrain_mm_mlp_adapter "${PRETRAIN_ADAPTER:-./checkpoints/cambrian-34b-pretrain/mm_projector.bin}" \
    --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", "openai/clip-vit-large-patch14-336", "facebook/dinov2-giant-res378", "clip-convnext-XXL-multi-stage"]' \
    --vision_tower_aux_token_len_list '[576, 576, 576, 9216]' \
    --image_token_len 576 \
    --num_query_group 1 \
    --query_num_list '[576]' \
    --connector_depth 3 \
    --connector_only False \
    --num_of_vision_sampler_layers 9 \
    --start_of_vision_sampler_layers 0 \
    --stride_of_vision_sampler_layers 7 \
    --vision_hidden_size 1024 \
    --mm_projector_type sva \
    --image_position 87 \
    --model_max_length 2048 \
    --tune_mm_mlp_adapter False \
    --unfreeze_mm_vision_tower False \
    --bf16 True \
    --output_dir "./checkpoints/${CKPT_NAME}" \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-5 \
    --mm_vision_sampler_lr 1e-5 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 2000 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_model 4 \
    --group_by_modality_length True
