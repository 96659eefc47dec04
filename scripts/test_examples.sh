#!/usr/bin/env bash
# Run every example workload in CI mode (small sizes, oracle asserts kept),
# mirroring the reference's scripts/test_examples.sh.
set -euo pipefail
cd "$(dirname "$0")/../examples"
for ex in spmv_add_example matmul_example sddmm_example mttkrp_example \
          hits_example triangles_example elemwise_example gcn_example \
          attention_example transformer_block_example csgraph_example \
          solvers_example stencil_example distributed_spmm_example; do
  echo "=== ${ex} ==="
  CI_MODE=1 python "${ex}.py"
done
echo "all examples passed"
