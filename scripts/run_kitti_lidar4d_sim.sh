#! /bin/bash
# Novel-trajectory simulation from a trained checkpoint
# (run_kitti_lidar4d_sim.sh equivalent).
python -m lidar4d_tpu.cli.main_lidar4d_sim \
  --config configs/kitti360_4950.txt \
  --workspace log/kitti360_lidar4d_f4950_release \
  --ckpt latest_model \
  --fov_lidar 2.0 26.9 \
  --H_lidar 66 \
  --W_lidar 1030 \
  --shift_x 0 --shift_y 0 --shift_z 0 \
  "$@"
