"""Long-horizon full-geometry joint training run (VERDICT r2 #3).

Drives the REAL CLI (neraf-train / neraf-eval subprocesses) for >=20,000
steps at the reference's exact training geometry — 128^3 grid, resnet50,
4096 rays + 4096 bake cells/step, 2048 STFT slices, audio joining at step
2000, checkpoints every 20k kept-all, in-training eval cadences live, HTTP
viewer attached and poked mid-run — then resumes from the 20k checkpoint
and verifies loss continuity. Publishes steady-state steps/s and step-time
drift to VALIDATION.md.

Scene: synthetic SoundSpaces-layout dataset at full audio geometry
(2x257x78 magnitudes) + a 12-view analytic-sphere vision scene, built on
disk so the run exercises the production data loaders end to end.

Run:  python scripts/longrun_joint.py --steps 20100 [--workdir /tmp/longrun]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def build_scene(workdir: Path, n_points: int = 24, n_train: int = 400,
                n_test: int = 16, img_size: int = 256, n_views: int = 12):
    from fixtures import make_soundspaces_scene, make_vision_scene

    scene = make_soundspaces_scene(workdir, n_points=n_points,
                                   n_train=n_train, n_test=n_test,
                                   max_frames=78, seed=3)
    # vision data lives inside the same scene dir (transforms.json contract)
    make_vision_scene(workdir, n_frames=n_views, size=img_size, seed=3,
                      scene_dir=scene.name)
    return scene


def _run_cli(args_list, env_extra, log_path, timeout_s):
    env = dict(os.environ)
    env.update(env_extra)
    with open(log_path, "ab") as log:
        return subprocess.run(args_list, env=env, stdout=log, stderr=log,
                              timeout=timeout_s, cwd=str(REPO))


def poke_viewer(port: int, deadline_s: float = 600.0) -> dict:
    """Poll /state until live, then fetch one /rir — proof the viewer serves
    during training without crashing the single-dispatch constraint."""
    result = {"state_ok": False, "rir_ok": False}
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            st = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/state", timeout=20).read())
            result["state_ok"] = True
            result["viewer_step"] = st.get("step")
            break
        except Exception:
            time.sleep(15)
    if result["state_ok"]:
        try:
            wav = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/rir?x=0&y=0&z=0.5&sx=1&sy=0&sz=0.5",
                timeout=900).read()
            result["rir_ok"] = wav[:4] == b"RIFF"
        except Exception as e:
            result["rir_error"] = str(e)[:200]
    return result


def parse_metrics(run_dir: Path) -> dict:
    rows = [json.loads(l) for l in
            (run_dir / "metrics.jsonl").read_text().splitlines() if l.strip()]
    train_rows = [r for r in rows
                  if r.get("prefix") == "train" and "steps_per_sec" in r]
    sps = np.asarray([r["steps_per_sec"] for r in train_rows], np.float64)
    steps = np.asarray([r["step"] for r in train_rows])
    # cadence windows (eval/checkpoint) depress individual samples; use the
    # median for steady state and quartile windows for drift
    q = len(sps) // 4
    out = {
        "logged_windows": len(sps),
        "steps_per_sec_median": float(np.median(sps)),
        "steps_per_sec_p10": float(np.percentile(sps, 10)),
        "steps_per_sec_first_quarter": float(np.median(sps[:q])) if q else None,
        "steps_per_sec_last_quarter": float(np.median(sps[-q:])) if q else None,
        "last_step": int(steps[-1]) if len(steps) else 0,
        "final_total_loss": float(train_rows[-1].get("total_loss", float("nan"))),
    }
    if q:
        out["drift_pct"] = round(
            100.0 * (out["steps_per_sec_first_quarter"]
                     - out["steps_per_sec_last_quarter"])
            / out["steps_per_sec_first_quarter"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20100)
    ap.add_argument("--resume-extra", type=int, default=200)
    ap.add_argument("--workdir", default="/tmp/longrun_joint")
    ap.add_argument("--port", type=int, default=7993)
    ap.add_argument("--timeout-s", type=int, default=4 * 3600)
    ap.add_argument("--resume-only", action="store_true",
                    help="skip the main run; resume from an existing workdir's"
                         " checkpoints and update its report.json")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    scene = build_scene(workdir)
    log_path = workdir / "cli.log"
    out_dir = workdir / "outputs"
    env = {"NeRAF_dataset": "SoundSpaces", "NeRAF_scene": scene.name}

    if args.resume_only:
        report = json.loads((workdir / "report.json").read_text())
    else:
        report = {"geometry": "grid 128^3, resnet50, 4096 rays + 4096 bake"
                              " cells, 2048 slices, 2x257x78, audio from step"
                              " 2000",
                  "steps": args.steps}

        # ---- main run (viewer poked from this process while it trains)
        train_cmd = [sys.executable, "-m", "neraf_tpu.cli.train",
                     "--data-root", str(workdir),
                     "--max-iters", str(args.steps),
                     "--output-dir", str(out_dir),
                     "--viewer-port", str(args.port)]
        t0 = time.time()
        proc = subprocess.Popen(train_cmd, env={**os.environ, **env},
                                stdout=open(log_path, "ab"),
                                stderr=subprocess.STDOUT, cwd=str(REPO))
        try:
            report["viewer"] = poke_viewer(args.port, deadline_s=3000)
            rc = proc.wait(timeout=args.timeout_s)
        finally:
            if proc.poll() is None:
                proc.kill()
        report["train_rc"] = rc
        report["train_wall_s"] = round(time.time() - t0, 1)
        if rc != 0:
            print(json.dumps(report, indent=1))
            sys.exit(1)

    run_dir = sorted((out_dir / f"{scene.name}_NeRAF" / "NeRAF").iterdir())[0]
    report["throughput"] = parse_metrics(run_dir)
    ckpts = sorted((run_dir / "neraf_models").glob("step-*"))
    report["checkpoints"] = [p.name for p in ckpts]

    if not args.resume_only:
        # ---- eval from the saved config (loads the latest = 20k checkpoint)
        rc_eval = _run_cli([sys.executable, "-m", "neraf_tpu.cli.evaluate",
                            "--load-config", str(run_dir / "config.yml"),
                            "--output-path", str(workdir / "eval_20k.json")],
                           env, log_path, 3600).returncode
        report["eval_rc"] = rc_eval
        if rc_eval == 0:
            report["eval_20k"] = json.loads(
                (workdir / "eval_20k.json").read_text())["results"]

    # ---- resume from the 20k checkpoint, run a bit further
    rc2 = _run_cli([sys.executable, "-m", "neraf_tpu.cli.train",
                    "--data-root", str(workdir),
                    "--max-iters", str(args.steps + args.resume_extra),
                    "--output-dir", str(out_dir),
                    "--load-dir", str(run_dir / "neraf_models")],
                   env, log_path, 3600).returncode
    report["resume_rc"] = rc2
    if rc2 == 0:
        resume_dir = sorted((out_dir / f"{scene.name}_NeRAF" / "NeRAF").iterdir())[-1]
        rows = [json.loads(l) for l in
                (resume_dir / "metrics.jsonl").read_text().splitlines()]
        rows = [r for r in rows
                if r.get("prefix") == "train" and "total_loss" in r]
        if rows:
            report["resume_first_logged"] = rows[0]
            # continuity: resumed loss within 3x of the pre-save loss (same
            # loss scale — a broken restore restarts near the init loss)
            pre = report["throughput"]["final_total_loss"]
            report["resume_loss_continuous"] = bool(
                rows[-1]["total_loss"] < 3 * max(pre, 1e-6))

    (workdir / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
