"""python -m dude_spark — see cli.py for the command surface."""

from .cli import main

import sys

sys.exit(main())
