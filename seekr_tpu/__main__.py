"""``python -m seekr_tpu`` — dispatch to the CLI."""

import sys

from seekr_tpu.cli import main

sys.exit(main())
