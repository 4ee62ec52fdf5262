#!/usr/bin/env python3
"""In-context A/B of the self-attention formulation (round 4).

proj: round-3/4 default — separate q/k/v linear projections to (B, S, C),
then attention_auto transposes to head-major (B, H, S, d) in HBM before the
flash kernel and transposes the output back (four relayouts of the big
latent tensors per self-attention layer).
fused: kernels.attention.fused_self_attention — the projections write
head-major DIRECTLY (einsum 'bsc,chd->bhsd') and the output projection
contracts the head axis ('bhsd,hdc->bsc'); the relayout rides the matmuls'
own indexing, no separate HBM pass. (The third option — a head-gridded
Pallas kernel over the natural layout — is structurally impossible: Mosaic
rejects singleton blocks on the second-to-minor axis; RESULTS.md record.)

The formulations are numerically identical (tests/test_kernels.py pins
them); only the schedule differs, so the in-context UNet-step slope is the
only meaningful comparison (isolated attention envelopes are unreadable
over the tunnel — RESULTS.md round-4 cross-attention record). Each variant
runs in a fresh process because NESR_SELFATTN is read at module IMPORT
time (unet.py's module-level SELFATTN_FORM) — setting it after the package
is imported has no effect, hence fresh subprocesses per variant.

Run ON TPU: python benchmarks/ab_selfattn_fused.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run_one(form: str) -> dict:
    env = dict(os.environ, NESR_SELFATTN=form)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import json, bench\n"
        "print('RESULT ' + json.dumps(bench._bench_sd_x4(size=128)))\n"
        % ROOT)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=2400, cwd=ROOT)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"form={form} failed:\n{out.stderr[-1500:]}")


def main():
    # proj first, fused second, then proj again: the repeat detects
    # within-run tunnel drift so a formulation win can be told from a trend.
    results = []
    for form in ("proj", "fused", "proj"):
        res = run_one(form)
        results.append((form, res))
        print(f"# {form}: {res}", flush=True)
    print(json.dumps({"ab": [{"form": f, **r} for f, r in results]}))


if __name__ == "__main__":
    main()
