#!/bin/bash
# Round-5 sequel: waits for the running alignatt-quality study (pid $1)
# to finish, then runs the trained-e2e proof and the trained-teacher
# speculative study.
set -x
cd /root/repo
AAQ_PID=${1:?usage: tools_r5_sequel.sh <aaq_pid>}
while kill -0 "$AAQ_PID" 2>/dev/null; do sleep 30; done
echo "AAQ_DONE"
JAX_PLATFORMS=cpu python tools_trained_e2e.py \
    --steps 2000 --offline-params /tmp/aaq_params.pkl \
    --traj-params /tmp/traj_params.pkl \
    --json docs/trained_e2e.json > /tmp/q_te2e.log 2>&1
echo "TE2E_DONE"
JAX_PLATFORMS=cpu python tools_spec_trained_teacher.py \
    --traj-params /tmp/traj_params.pkl \
    --json docs/spec_trained_teacher.json > /tmp/q_spec.log 2>&1
echo "SEQUEL_DONE"
