#!/bin/bash
# Round-5 CPU study queue (serial: single-core host).
# 1. AlignAtt early-stop quality study (trained tiny model) -> artifact
# 2. Trained-model end-to-end proof (train->export->agent->eval, both agents)
set -x
cd /root/repo
JAX_PLATFORMS=cpu python tools_alignatt_quality.py \
    --steps 3000 --workdir /tmp/aaq_run \
    --save-params /tmp/aaq_params.pkl \
    --json docs/alignatt_quality.json > /tmp/q_aaq.log 2>&1
JAX_PLATFORMS=cpu python tools_trained_e2e.py \
    --steps 3000 --offline-params /tmp/aaq_params.pkl \
    --traj-params /tmp/traj_params.pkl \
    --json docs/trained_e2e.json > /tmp/q_te2e.log 2>&1
echo QUEUE_DONE
