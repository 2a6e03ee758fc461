"""Shared CLI plumbing for the jobs/ entrypoints."""

from __future__ import annotations

import argparse


def fill_defaults(args, parser: argparse.ArgumentParser):
    """Backfill any attribute a programmatic caller's namespace omits
    with the CLI default, so run(SimpleNamespace(input=..., ...))
    stays a stable API as a job grows flags. Mutates and returns
    `args`."""
    for a in parser._actions:
        if a.dest != "help" and not hasattr(args, a.dest):
            setattr(args, a.dest, a.default)
    return args
