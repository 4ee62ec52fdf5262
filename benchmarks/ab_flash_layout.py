#!/usr/bin/env python3
"""In-context A/B of the flash self-attention operand layout (round 4).

bhsd: round-3/4 default — q/k/v are transposed to head-major (B, H, S, d)
in HBM before the kernel, and the output transposed back (four relayouts
of the big latent tensors per self-attention layer).
bshd: head-gridded kernel over the NATURAL (B, S, H, d) layout — the head
axis is a BlockSpec grid dimension, no HBM relayout.

The layouts are numerically identical (tests/test_kernels.py pins them);
only the schedule differs, so the in-context UNet-step slope is the only
meaningful comparison (isolated attention envelopes are unreadable over
the tunnel — RESULTS.md round-4 cross-attention record). Each layout runs
in a fresh process because the layout env is read at trace time and
bench's jit caches would otherwise serve the first-traced program.

Run ON TPU: python benchmarks/ab_flash_layout.py
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run_one(layout: str) -> dict:
    env = dict(os.environ, NESR_FLASH_LAYOUT=layout)
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
    raise RuntimeError(f"layout={layout} failed:\n{out.stderr[-1500:]}")


def main():
    # bhsd first, bshd second, then bhsd again: the repeat detects
    # within-run tunnel drift so a layout win can be told from a trend.
    results = []
    for layout in ("bhsd", "bshd", "bhsd"):
        res = run_one(layout)
        results.append((layout, res))
        print(f"# {layout}: {res}", flush=True)
    print(json.dumps({"ab": [{"layout": l, **r} for l, r in results]}))


if __name__ == "__main__":
    main()
