#!/usr/bin/env python3
"""NESR-TPU — main entry point for both CLI and GUI.

Same role as the reference's repo-root main.py (/root/reference/main.py):
dependency checks, environment setup, then CLI or GUI dispatch. The real
implementation lives in neural_enhanced_super_resolution_tpu.cli.
"""

import importlib.util
import logging
import sys

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
logger = logging.getLogger("nesr")


def check_dependencies() -> bool:
    """Verify core dependencies (reference main.py:18-54; torch is only a
    host-side checkpoint-IO dependency here, jax is the compute runtime)."""
    missing = [dep for dep in ("jax", "numpy", "PIL")
               if importlib.util.find_spec(dep) is None]
    if missing:
        print("Missing required dependencies:")
        for dep in missing:
            print(f"  - {dep}")
        return False
    return True


def setup_environment() -> None:
    """Log the accelerator situation (reference main.py:56-77 probes CUDA;
    we probe the JAX backend)."""
    try:
        import jax
        devices = jax.devices()
        kinds = {d.device_kind for d in devices}
        logger.info("JAX %s: %d device(s): %s", jax.__version__,
                    len(devices), ", ".join(sorted(kinds)))
    except Exception as exc:  # pragma: no cover
        logger.warning("JAX initialisation problem: %s", exc)


def main() -> int:
    setup_environment()
    if not check_dependencies():
        return 2
    from neural_enhanced_super_resolution_tpu.cli import main as cli_main
    return cli_main()


if __name__ == "__main__":
    sys.exit(main())
