#!/usr/bin/env bash
# Stage 2: freeze w2v2 body, train adapter + LLM from stage-1 weights.
# Mirrors the reference's scripts/train/stage2.sh hyperparameters.
set -euo pipefail

llama_path=${LLAMA_PATH:?path to llama-3.1-8b-instruct-hf}
w2v2_path=${W2V2_PATH:?path to wav2_vec_vox_960h_pl.pt}
data_path=${DATA_PATH:?path to en-xx data dir}
stage1_bin=${STAGE1_BIN:?stage-1 exported bin (train.checkpoint.export_torch_bin)}
save_dir=${SAVE_DIR:-runs/stage2}
lang=${TARGET_LANG:-German}

python -m infinisst_tpu.train.main \
    --w2v2_path "${w2v2_path}" \
    --llm_path "${llama_path}" \
    --tokenizer_path "${llama_path}" \
    --sllm_weight_path "${stage1_bin}" \
    --data_path "${data_path}" \
    --data_split_train 'train_nospeaker_traj_30_filtered' \
    --data_split_eval 'dev_nospeaker_traj_30_filtered' \
    --source_lang "English" \
    --target_lang "${lang}" \
    --trajectory 4 \
    --trajectory_max_multiplier 4 \
    --stage 2 \
    --train_bsz 1800 \
    --eval_bsz 1800 \
    --bsz_sent 2 \
    --learning_rate 7e-6 \
    --warmup_steps 100 \
    --max_epochs 1 \
    --grad_acc_steps 4 \
    --clip_norm 1.0 \
    --save_dir "${save_dir}" \
    --n_data 2 --n_model 4 --zero True
# dp2 x tp4: the only v5e-8 mesh where the 8B stage-2 step fits in
# 16 GiB/chip (14.2 GiB; dp8 peaks at 20.0, dp4xtp2 at 16.5 — AOT
# memory analysis in docs/memplan_8b.json, tools_memplan.py)
