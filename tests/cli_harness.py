"""Shared CLI test harness: run a module's main() with patched argv."""

import sys


def run_cli_main(main_fn, argv, capsys):
    """Invoke ``main_fn`` with ``sys.argv = [prog] + argv``; return the
    captured stdout. argv is always restored (even on SystemExit)."""
    old = sys.argv
    sys.argv = ["prog"] + list(argv)
    try:
        main_fn()
    finally:
        sys.argv = old
    return capsys.readouterr().out
