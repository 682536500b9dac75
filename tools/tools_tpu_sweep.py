"""One-process TPU measurement sweep — single backend claim, all numbers.

The axon tunnel serializes clients and a killed claim can wedge the pool,
so when the TPU comes back run EVERYTHING in one process:
  1. bench (rasterize fwd+bwd Mpix/s)        — bench.py's measurement
  2. refine loop (the streaming 82% block)   — tools_bench_refine_loop's
  3. roofline (streaming fps composition)    — roofline.py main numbers
Writes tpu_sweep.json. Usage: timeout 3000 python tools_tpu_sweep.py
"""
import json
import subprocess
import sys
import time

RESULTS = {}


def run(name, argv, timeout=2400):
    t0 = time.time()
    p = subprocess.run([sys.executable] + argv, capture_output=True,
                       text=True, timeout=timeout)
    out = (p.stdout or "") + (p.stderr or "")
    RESULTS[name] = {"rc": p.returncode, "wall_s": time.time() - t0,
                     "tail": out.strip().splitlines()[-6:]}
    print(f"== {name} rc={p.returncode} {time.time()-t0:.0f}s")
    for line in RESULTS[name]["tail"]:
        print("  ", line)
    with open("tpu_sweep.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


if __name__ == "__main__":
    # sequential — each is its own process so a hang can be timed out
    # without killing the sweep; but NEVER two at once (tunnel serializes)
    run("bench", ["bench.py"])
    run("refine_loop", ["tools_bench_refine_loop.py"])
    run("roofline", ["roofline.py"])
    run("profile_refine", ["profile_stages.py", "--what", "refine"])
    run("profile_agm", ["profile_stages.py", "--what", "agm"])
    run("precision", ["tools_precision_check.py"])
