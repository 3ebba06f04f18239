#! /bin/bash
# Reference-parity training run (run_kitti_lidar4d.sh equivalent).
python -m lidar4d_tpu.cli.main_lidar4d \
  --config configs/kitti360_4950.txt \
  --workspace log/kitti360_lidar4d_f4950_release \
  --lr 1e-2 \
  --num_rays_lidar 1024 \
  --iters 30000 \
  --alpha_d 1 \
  --alpha_i 0.1 \
  --alpha_r 0.01 \
  "$@"

# --refine
# --test_eval
