"""``python -m nesr`` — the entry point the reference documents
(README.md:58) but never ships (SURVEY.md §3.1)."""

import sys

from neural_enhanced_super_resolution_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
