"""Render + commit the frozen benchmark fixtures (see io/fixtures.py).

Idempotent: existing manifest entries are kept unless --rebuild is
given. Rebuilding re-anchors the bench history — do it only after an
intentional renderer/spec change, and say so in the commit message.

Usage: python scripts/make_fixtures.py [--rebuild] [--only NAME]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cv_monoslam_tpu.io import fixtures


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rebuild", action="store_true")
    p.add_argument("--only", default=None)
    args = p.parse_args()
    names = [args.only] if args.only else list(fixtures.SPECS)
    for name in names:
        path = fixtures.build(name, force=args.rebuild)
        mb = os.path.getsize(path) / 2**20
        print(f"{name}: {path} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
