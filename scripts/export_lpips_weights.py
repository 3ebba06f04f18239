"""Export official LPIPS (AlexNet) weights to the .npz `eval.lpips_jax` loads.

Run this on a machine with network access + `torchvision` + `lpips`:

    python scripts/export_lpips_weights.py --out lpips_alex.npz

then point the evaluation at it:

    LIDAR4D_LPIPS_WEIGHTS=lpips_alex.npz python -m lidar4d_tpu.cli.main_lidar4d ...

Without this file, eval falls back to a deterministic random-feature
perceptual distance (usable for relative comparison, not comparable with
published LPIPS numbers) — see eval/lpips_jax.py.
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="lpips_alex.npz")
    args = p.parse_args()

    import lpips  # pip install lpips
    import torch

    net = lpips.LPIPS(net="alex")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] \
        + [m for m in net.net.slice3] + [m for m in net.net.slice4] \
        + [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 AlexNet convs, got {len(convs)}"
    for i, m in enumerate(convs):
        out[f"conv{i}_w"] = m.weight.detach().numpy()
        out[f"conv{i}_b"] = m.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}"] = w.reshape(-1)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
