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

# All variants keep the Pallas flash attention ON: with
# NESR_DISABLE_FLASH_ATTENTION=1 the XLA einsum path at 128^2 latents
# (16384-token self-attention -> 8.6 GB of f32 scores) did not even finish
# compiling in 40 minutes — flash is structurally required at these
# shapes, which settles the round-3 flash-vs-XLA question by itself.
# The decomposition runs at the production 128^2 latent: 96^2 was tried
# and its ~3x-faster step drowns in the tunnel's fixed noise (measured
# slope spread 0.81 vs 0.19 at 128^2). The groupnorm variant is known to
# risk a scoped-VMEM OOM inside the flash kernel at 128^2 (fusion
# lottery); the harness reports FAILED for it and derives the remaining
# shares.
ABLATIONS = ["", "groupnorm", "selfattn", "crossattn", "ff", "cfg"]
SIZE = int(os.environ.get("NESR_SD_DECOMP_SIZE", "128"))


def run_one(ablate: str) -> dict:
    env = dict(os.environ, NESR_SD_ABLATE=ablate)
    env.pop("NESR_DISABLE_FLASH_ATTENTION", None)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, bench\n"
        "print('RESULT ' + json.dumps(bench._bench_sd_x4(size=%d)))\n"
        % (ROOT, SIZE))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=2400, cwd=ROOT)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"ablate={ablate!r} failed:\n{out.stderr[-1500:]}")


def main():
    rates = {}
    print(f"# latent {SIZE}x{SIZE}, flash attention on", flush=True)
    for ab in ABLATIONS:
        try:
            res = run_one(ab)
        except Exception as exc:  # noqa: BLE001 — keep partial results
            print(f"# {ab or 'base':10s} FAILED: {str(exc)[-300:]}",
                  flush=True)
            continue
        rates[ab or "base"] = res
        print(f"# {ab or 'base':10s} {res}", flush=True)
    base = rates.get("base", {}).get("sd_x4_steps_per_s")
    if not base or base <= 0:
        # Without a usable base slope no share can be derived; keep the
        # per-variant rates (each cost up to 40 min) rather than crashing.
        print(json.dumps({"latent": SIZE, "error": "no usable base rate",
                          "rates": rates}))
        return
    shares = {}
    for ab in ABLATIONS:
        key = ab or "base"
        if key in ("base", "base_flash") or key not in rates:
            continue
        r = rates[key].get("sd_x4_steps_per_s")
        if r and r > 0:
            shares[key] = round(1.0 - base / r, 3)
    # cfg overlaps every other component (ablating it halves the UNet
    # batch, i.e. removes half of attention/ff/conv too), so it is
    # excluded from the disjoint-residual arithmetic. Its share is still
    # reported: 1 - base/rate_cfg is the cost of the uncond half — and if
    # it exceeds 0.5, batch-2 runs the components LESS efficiently than
    # two batch-1 passes would (see RESULTS.md round-4 decomposition).
    shares["conv_resnet_residual"] = round(
        1.0 - sum(max(v, 0.0) for k, v in shares.items() if k != "cfg"), 3)
    out = {"latent": SIZE, "base_steps_per_s": base,
           "step_shares": shares}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
