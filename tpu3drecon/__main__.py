"""python -m tpu3drecon — CLI entry point (tpu3drecon/cli.py)."""

from tpu3drecon.cli import main

raise SystemExit(main())
