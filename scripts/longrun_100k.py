"""100k-step long-horizon joint run via the --resume-only checkpoint chain.

VERDICT r4 #3 (carry-over from r3 #9): the longest demonstrated run was
20,100 steps — 5% of the reference's 400,001 budget (NeRAF_config.py:76).
This chains N legs of `neraf-train` through ONE pinned --run-dir, each leg
resuming from the previous leg's latest checkpoint, and verifies:

  - steps/s stability across the whole run (median per leg + total drift),
  - LR spot-checks at 50k/100k: the lr_fields / lr_audio_fields scalars the
    train step logs FROM THE RESTORED OPTIMIZER SCHEDULE COUNTS must match
    the analytic nerfstudio ExponentialDecay schedules (audio warmup/decay,
    reference NeRAF_config.py:126-131),
  - checkpoint rotation: keep-all saves accumulate (>= steps/20000 dirs),
  - loss continuity across every leg boundary.

Scene/geometry: identical to scripts/longrun_joint.py — full reference
geometry (grid 128^3, resnet50, 4096 rays + 4096 bake cells, 2048 slices,
2x257x78 STFTs, audio from step 2000).

Run:  python scripts/longrun_100k.py [--total-steps 100000] [--leg 20000]
      [--workdir /tmp/longrun100k]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from scripts.longrun_joint import build_scene  # noqa: E402


def analytic_lr(step, lr_init, lr_final, max_steps, warmup_steps=0,
                lr_pre_warmup=1e-8):
    """nerfstudio ExponentialDecayScheduler (engine/optimizers.py)."""
    if warmup_steps > 0 and step < warmup_steps:
        return lr_pre_warmup + (lr_init - lr_pre_warmup) * np.sin(
            0.5 * np.pi * step / warmup_steps)
    t = np.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1),
                0.0, 1.0)
    return float(np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total-steps", type=int, default=100000)
    ap.add_argument("--leg", type=int, default=20000)
    ap.add_argument("--workdir", default="/tmp/longrun100k")
    ap.add_argument("--leg-timeout-s", type=int, default=2 * 3600)
    ap.add_argument("--report-only", action="store_true",
                    help="skip training; re-analyze an existing workdir")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    scene = build_scene(workdir)
    run_dir = workdir / "run"
    log_path = workdir / "cli.log"
    env = dict(os.environ, NeRAF_dataset="SoundSpaces", NeRAF_scene=scene.name)

    report = {"geometry": "grid 128^3, resnet50, 4096 rays + 4096 bake cells,"
                          " 2048 slices, 2x257x78, audio from step 2000",
              "total_steps": args.total_steps, "leg": args.leg, "legs": []}

    if not args.report_only:
        leg_ends = list(range(args.leg, args.total_steps + 1, args.leg))
        if leg_ends[-1] != args.total_steps:
            leg_ends.append(args.total_steps)
        for i, end in enumerate(leg_ends):
            cmd = [sys.executable, "-m", "neraf_tpu.cli.train",
                   "--data-root", str(workdir),
                   "--max-iters", str(end),
                   "--run-dir", str(run_dir)]
            if i > 0:
                cmd += ["--load-dir", str(run_dir / "neraf_models")]
            t0 = time.time()
            with open(log_path, "ab") as log:
                rc = subprocess.run(cmd, env=env, stdout=log,
                                    stderr=subprocess.STDOUT, cwd=str(REPO),
                                    timeout=args.leg_timeout_s).returncode
            leg = {"end": end, "rc": rc, "wall_s": round(time.time() - t0, 1)}
            report["legs"].append(leg)
            print(json.dumps(leg), flush=True)
            if rc != 0:
                (workdir / "report.json").write_text(json.dumps(report, indent=1))
                print(json.dumps(report, indent=1))
                sys.exit(1)

    # ---------------- analysis over the single appended metrics.jsonl
    rows = [json.loads(l) for l in
            (run_dir / "metrics.jsonl").read_text().splitlines() if l.strip()]
    train = [r for r in rows if r.get("prefix") == "train"]
    steps = np.asarray([r["step"] for r in train])
    sps = np.asarray([r["steps_per_sec"] for r in train], np.float64)
    q = len(sps) // 4
    report["throughput"] = {
        "logged_windows": int(len(sps)),
        "steps_per_sec_median": float(np.median(sps)),
        "steps_per_sec_p10": float(np.percentile(sps, 10)),
        "first_quarter_median": float(np.median(sps[:q])) if q else None,
        "last_quarter_median": float(np.median(sps[-q:])) if q else None,
        "last_step": int(steps.max()),
    }
    if q:
        report["throughput"]["drift_pct"] = round(
            100.0 * (report["throughput"]["first_quarter_median"]
                     - report["throughput"]["last_quarter_median"])
            / report["throughput"]["first_quarter_median"], 2)

    # LR spot-checks against the analytic schedules (defaults from
    # configs/config.py OptimizersConfig = reference NeRAF_config.py:115-132)
    lr_checks = []
    for target in (50000, args.total_steps):
        cands = [r for r in train if "lr_fields" in r]
        if not cands:
            break
        r = min(cands, key=lambda r: abs(r["step"] - target))
        expect_fields = analytic_lr(r["step"], 1e-2, 1e-4, 200000, 0)
        expect_audio = analytic_lr(r["step"], 1e-4, 1e-8, 1002000, 2000)
        lr_checks.append({
            "step": r["step"],
            "lr_fields": r["lr_fields"], "lr_fields_expect": expect_fields,
            "lr_fields_ok": bool(np.isclose(r["lr_fields"], expect_fields,
                                            rtol=2e-3)),
            "lr_audio_fields": r["lr_audio_fields"],
            "lr_audio_fields_expect": expect_audio,
            "lr_audio_fields_ok": bool(np.isclose(
                r["lr_audio_fields"], expect_audio, rtol=2e-3)),
        })
    report["lr_checks"] = lr_checks

    # checkpoint rotation: keep-all saves accumulate in the ONE run dir
    ckpts = sorted((run_dir / "neraf_models").glob("step-*"))
    report["checkpoints"] = [p.name for p in ckpts]
    report["keep_all_ok"] = len(ckpts) >= args.total_steps // 20000

    # loss continuity across every leg boundary
    losses = {int(r["step"]): r.get("total_loss") for r in train
              if "total_loss" in r}
    cont = []
    for end in range(args.leg, args.total_steps, args.leg):
        pre = [s for s in losses if s <= end]
        post = [s for s in losses if s > end]
        if pre and post:
            l_pre, l_post = losses[max(pre)], losses[min(post)]
            cont.append({"boundary": end, "loss_pre": l_pre,
                         "loss_post": l_post,
                         "continuous": bool(l_post < 3 * max(l_pre, 1e-6))})
    report["resume_continuity"] = cont

    (workdir / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
