#!/bin/bash
# Paper-scale Moving-MNIST protocols (VERDICT r4 item 1): the reference's
# 5,000-sequence x 100-frame test set (make_test_set.py:39-41), scored on
# TPU by the freeze-resistant eval path, each protocol supervised with
# chunk-level auto-resume. Usage:
#   tools/run_paper_mnist_protocols.sh <xp_dir> <paper_data_dir> [log_dir]
# Prereqs: <paper_data_dir> holds mmnist_test_2digits_64.npz generated with
#   cli.make_mnist_test --n_seq 5000 --out_dir <paper_data_dir>
# plus an MNIST/ raw-idx corpus (symlink fine) for the swap/archive branch.
set -euo pipefail
XP=$1
DATA=$2
LOG=${3:-/tmp}
M=spatiotemporal_variable_separation_tpu
SUP="python -m $M.cli.supervise --stall_timeout 600"

run () { # name, entry, extra args...
  local name=$1 entry=$2; shift 2
  echo "=== $name ==="
  /usr/bin/time -f "$name wall %e s" \
    $SUP --entry $M.cli.$entry -- \
    --xp_dir "$XP" --data_dir "$DATA" --batch_size 64 --archive_cap 64 "$@" \
    2>&1 | tee "$LOG/paper_$name.log" | tail -4
}

run t10  test_mnist                 --nt_pred 10
run t95  test_mnist                 --nt_pred 95
run swap test_mnist_disentanglement --nt_pred 10
echo "=== evals.json ==="
cat "$XP/evals.json"
