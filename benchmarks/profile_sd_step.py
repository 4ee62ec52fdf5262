#!/usr/bin/env python3
"""SD-x4 denoise-step decomposition via ablation slopes (VERDICT r3 #4b).

Each component of the UNet step (GroupNorm, self-attention over the latent
grid, cross-attention to the text embedding, the GEGLU feed-forward, and
the classifier-free-guidance batch doubling) can be switched to a cheap
passthrough with NESR_SD_ABLATE (models/diffusion/layers.SD_ABLATE, read
at trace time). This driver runs bench._bench_sd_x4's interleaved 20/5
slope in a fresh subprocess per ablation; a component's share of the step
is 1 - rate_base/rate_ablated.

Convs can't be ablated shape-safely (channel counts change through the
resnets), so the conv+resnet share is reported as the residual.

Run ON TPU: python benchmarks/profile_sd_step.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")

ABLATIONS = ["", "groupnorm", "selfattn", "crossattn", "ff", "cfg"]


def run_one(ablate: str) -> dict:
    env = dict(os.environ, NESR_SD_ABLATE=ablate)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, bench\n"
        "print('RESULT ' + json.dumps(bench._bench_sd_x4()))\n" % ROOT)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=2400, cwd=ROOT)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"ablate={ablate!r} failed:\n{out.stderr[-1500:]}")


def main():
    rates = {}
    for ab in ABLATIONS:
        res = run_one(ab)
        rates[ab or "base"] = res
        print(f"# {ab or 'base':10s} {res}", flush=True)
    base = rates["base"]["sd_x4_steps_per_s"]
    shares = {}
    for ab in ABLATIONS[1:]:
        r = rates[ab].get("sd_x4_steps_per_s")
        if r and r > 0:
            shares[ab] = round(1.0 - base / r, 3)
    shares["conv_resnet_residual"] = round(
        1.0 - sum(max(v, 0.0) for v in shares.values()), 3)
    print(json.dumps({"base_steps_per_s": base, "step_shares": shares}))


if __name__ == "__main__":
    main()
