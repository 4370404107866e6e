"""``python -m kerf_spark`` — the interactive console (main.cc:33-73)."""

from .repl import main

raise SystemExit(main())
