"""Floater / CD-divergence diagnosis (VERDICT r4 next-round #3).

The 10k-iter flagship schedule shows every ROBUST metric improving
monotonically (F-score, depth MedAE) while every MEAN metric degrades
(CD 0.221 -> 0.317, RMSE) — the small-capacity/long-schedule floater
dynamic (PERF.md r3). This script answers WHERE the CD mass lives, per
eval frame, by attributing each point's chamfer contribution back to its
range-image pixel:

  dist1 (pred -> gt) splits into
    * FP points: predicted raydrop > 0.5 where gt_raydrop == 0 — spurious
      geometry the mask should have dropped;
    * TP points: both masks agree the ray returns — genuine depth error;
  dist2 (gt -> pred) is geometry the prediction is missing entirely.

For each bucket: its share of the CD sum, the top-1% point share (how
heavy the tail is), and the pano-row histogram (LiDAR elevation bands —
sky/horizon rows vs ground rows). Per-frame per-pixel sqrt(dist1) error
maps are saved to <workspace>/diag/ for visual inspection.

Reference masking parity note: the reference computes CD on
`preds_depth * mask` vs `gt_depth * gt_raydrop` panos back-projected with
zero-depth pixels dropped (runner.py:596-602, metrics.py:247-262,
convert.py:141-155); this repo's meters do the identical masking
(train/trainer.py:423-455, eval/meters.py PointsMeter) — verified r5, so
the divergence is model behavior, not metric skew.

Run (after a training run left checkpoints in the workspace):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_floaters.py \
      --config configs/bench_flagship_10k.txt [--ckpt best|latest|<path>]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pano_pixel_indices(pano):
    """Row/col of each point pano_to_lidar would emit (row-major nonzero)."""
    rows, cols = np.where(pano != 0.0)
    return rows, cols


def bucket_stats(dists, rows, H, label, top_frac=0.01):
    total = float(dists.sum()) if dists.size else 0.0
    out = {"label": label, "n_points": int(dists.size), "sum": total,
           "mean": float(dists.mean()) if dists.size else 0.0}
    if dists.size:
        k = max(1, int(top_frac * dists.size))
        top = np.sort(dists)[-k:]
        out["top1pct_share"] = float(top.sum() / max(total, 1e-12))
        # row histogram of the top-k contributors (where the tail lives)
        top_idx = np.argsort(dists)[-k:]
        hist, _ = np.histogram(rows[top_idx], bins=8, range=(0, H))
        out["top1pct_row_hist"] = hist.tolist()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default="best")
    ap.add_argument("--workspace", default=None)
    args = ap.parse_args()

    import jax

    from lidar4d_tpu.cli.config import (
        build_loss_config,
        build_model_config,
        get_arg_parser,
    )
    from lidar4d_tpu.data import KITTI360Dataset
    from lidar4d_tpu.models.lidar4d import LiDAR4DField
    from lidar4d_tpu.ops.chamfer import chamfer_distance, pad_cloud
    from lidar4d_tpu.ops.pano import pano_to_lidar
    from lidar4d_tpu.train.trainer import Trainer

    print("backend:", jax.default_backend(), flush=True)
    parser = get_arg_parser()
    opt = parser.parse_args(["--config", args.config, "--test_eval"])
    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale
    if args.workspace:
        opt.workspace = args.workspace

    field = LiDAR4DField(build_model_config(opt))
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt),
        workspace=opt.workspace, lidar_metrics=[],
        use_checkpoint=args.ckpt, eval_interval=opt.eval_interval,
    )
    print(f"loaded epoch {trainer.epoch} step {trainer.global_step}",
          flush=True)
    params = trainer._eval_params()

    ds = KITTI360Dataset(
        split="val", root_path=opt.path, sequence_id=opt.sequence_id,
        scale=opt.scale, offset=opt.offset, fov_lidar=opt.fov_lidar,
    )
    H, W = ds.H_lidar, ds.W_lidar
    diag_dir = os.path.join(opt.workspace, "diag")
    os.makedirs(diag_dir, exist_ok=True)

    import jax.numpy as jnp

    def padded_chamfer(a, b):
        """Bucket-padded exact chamfer (meters.py trick): returns d1[:P], d2[:Q]."""
        size_a = int(-(-a.shape[0] // 8192) * 8192)
        size_b = int(-(-b.shape[0] // 8192) * 8192)
        pa, na = pad_cloud(jnp.asarray(a), size_a)
        pb, nb = pad_cloud(jnp.asarray(b), size_b)
        d1, d2, i1, i2 = chamfer_distance(pa[None], pb[None])
        return np.asarray(d1[0][:na]), np.asarray(d2[0][:nb])

    agg = []
    for i in range(len(ds)):
        img = np.asarray(ds.images_lidar[i])
        gt_raydrop = img[..., 0]
        gt_depth = img[..., 2] * gt_raydrop

        t0 = time.perf_counter()
        raydrop, intensity, depth = trainer._render_frame(params, ds, i)
        if trainer.opt.raydrop_loss == "bce":
            raydrop = 1 / (1 + np.exp(-raydrop))
        mask = (raydrop > 0.5).astype(np.float32)
        pred_depth = depth * mask
        render_s = time.perf_counter() - t0

        pred_pano = pred_depth / opt.scale
        gt_pano = gt_depth / opt.scale
        pred_pts = pano_to_lidar(pred_pano, opt.fov_lidar).astype(np.float32)
        gt_pts = pano_to_lidar(gt_pano, opt.fov_lidar).astype(np.float32)
        pr, pc = pano_pixel_indices(pred_pano)
        gr, gc = pano_pixel_indices(gt_pano)

        d1, d2 = padded_chamfer(pred_pts, gt_pts)
        cd = float(d1.mean() + d2.mean())

        fp = gt_raydrop[pr, pc] == 0  # predicted return where gt dropped
        stats = {
            "frame": i,
            "cd": cd,
            "cd_pred_side": float(d1.mean()),
            "cd_gt_side": float(d2.mean()),
            "render_s": round(render_s, 2),
            "pred_points": int(d1.size),
            "gt_points": int(d2.size),
            "buckets": [
                bucket_stats(d1[fp], pr[fp], H, "pred FP (mask disagrees)"),
                bucket_stats(d1[~fp], pr[~fp], H, "pred TP (depth error)"),
                bucket_stats(d2, gr, H, "gt->pred (missing geometry)"),
            ],
        }
        # share of the pred-side CD carried by FP points
        s_fp = stats["buckets"][0]["sum"]
        s_tp = stats["buckets"][1]["sum"]
        stats["fp_share_of_pred_cd"] = float(s_fp / max(s_fp + s_tp, 1e-12))
        agg.append(stats)
        print(json.dumps(stats), flush=True)

        err_map = np.zeros((H, W), np.float32)
        err_map[pr, pc] = np.sqrt(np.maximum(d1, 0.0))
        np.save(os.path.join(diag_dir, f"err_pred_{i:04d}.npy"), err_map)
        gt_err = np.zeros((H, W), np.float32)
        gt_err[gr, gc] = np.sqrt(np.maximum(d2, 0.0))
        np.save(os.path.join(diag_dir, f"err_gt_{i:04d}.npy"), gt_err)

    mean_cd = float(np.mean([s["cd"] for s in agg]))
    mean_fp = float(np.mean([s["fp_share_of_pred_cd"] for s in agg]))
    summary = {
        "mean_cd": mean_cd,
        "mean_fp_share_of_pred_cd": mean_fp,
        "mean_pred_side": float(np.mean([s["cd_pred_side"] for s in agg])),
        "mean_gt_side": float(np.mean([s["cd_gt_side"] for s in agg])),
        "frames": len(agg),
        "ckpt_epoch": trainer.epoch,
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    with open(os.path.join(diag_dir, "summary.json"), "w") as f:
        json.dump({"summary": summary, "frames": agg}, f, indent=1)
    print("DIAG DONE", flush=True)


if __name__ == "__main__":
    main()
