"""Approximation-ladder quality gates at 256² with the TRAINED checkpoint
(round-5 verdict item 3).

Runs the 256² synthetic stream (configs/synthetic_stream_256.yaml) once
per ladder config and tabulates avg PSNR + per-frame deltas vs the exact
reference config. Every adopted approximation is exercised JOINTLY
(production defaults) and ablated:

  production  — approx KNN (recall≈0.99), Morton-64 FPS, 128² depth
                carry, shared_window_pairs ON, per-module bf16 ON
  exact_knn   — exact top-k
  exact_fps   — fps_buckets=1 (sequential greedy FPS)
  no_shared   — shared_window_pairs off (exact per-candidate binning)
  f32         — per-module bf16 off
  carry64/256 — depth_view_res 64 / 256 (the carry-resolution ladder —
                vacuous at 64² in round 4, exercised for real here)
  exact_all   — everything exact at once (the reference-semantics pole)

Usage: python tools/tools_gates_256.py /path/to/params.msgpack
Writes GATES_256.json at the repo root.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # exact_all first (the reference-semantics pole every delta is
    # measured against), production second; single-knob ablations after.
    "exact_all": ["opt.exact_knn=true", "opt.fps_buckets=1",
                  "opt.shared_window_pairs=false",
                  "system.encoder_bf16=false", "system.cnn_bf16=false",
                  "system.ft_bf16=false", "opt.depth_view_res=256"],
    "production": [],
    "no_shared_pairs": ["opt.shared_window_pairs=false"],
    "f32": ["system.encoder_bf16=false", "system.cnn_bf16=false",
            "system.ft_bf16=false"],
    "carry64": ["opt.depth_view_res=64"],
    "carry256": ["opt.depth_view_res=256"],
    "exact_knn": ["opt.exact_knn=true"],
    "exact_fps": ["opt.fps_buckets=1"],
}


def main():
    ckpt = sys.argv[1]
    assert os.path.exists(ckpt), ckpt
    # Optional frame trim (wall-clock budget): each stream batch is
    # eval_batch_size frames; PSNR averages over what ran.
    max_batches = sys.argv[2] if len(sys.argv) > 2 else None
    results = {}
    for name, over in CONFIGS.items():
        ws = f"logs/igs_tpu/gates256/{name}"
        cmd = [
            sys.executable, "infer_stream.py",
            "--config", "configs/synthetic_stream_256.yaml",
            f"opt.resume={ckpt}", f"opt.workspace={ws}",
        ] + (["--max-batches", max_batches] if max_batches else []) + over
        print("==>", name, " ".join(over))
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            results[name] = {"error": r.returncode}
            continue
        with open(os.path.join(ROOT, ws, "results.json")) as f:
            res = json.load(f)
        results[name] = {
            "avg": res["avg"],
            "psnr": res["psnr"],
            "overflow_events": res["overflow_events"],
            "overrides": over,
        }
        print(f"    avg PSNR {res['avg']:.4f}")
        _write(ckpt, results)  # incremental: partial ladder survives a cut
    print("wrote GATES_256.json")


def _write(ckpt, results):
    base = results.get("exact_all", {}).get("avg")
    table = {}
    for name, r in results.items():
        r = dict(r)
        if "avg" in r and base:
            r["delta_vs_exact_all_db"] = r["avg"] - base
        table[name] = r
    out = {"what": "256^2 trained-checkpoint approximation ladder",
           "checkpoint": ckpt, "results": table}
    with open(os.path.join(ROOT, "GATES_256.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
