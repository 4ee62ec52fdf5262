"""``python -m neural_enhanced_super_resolution_tpu`` entry point.

The reference documents ``python -m nesr`` but ships no __main__
(SURVEY.md §3.1 note); here both this package and the ``nesr`` alias are
runnable modules.
"""

import sys

from neural_enhanced_super_resolution_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
