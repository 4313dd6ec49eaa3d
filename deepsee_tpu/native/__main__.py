"""Build/inspect the native codec: python -m deepsee_tpu.native --build"""

import argparse
import sys

from deepsee_tpu import native


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--build", action="store_true",
                   help="compile libdeepsee_native.so in place")
    args = p.parse_args()
    if args.build:
        if not native.build(quiet=False):
            print("native codec build FAILED", file=sys.stderr)
            return 1
    lib = native.load()
    if lib is None:
        print("native codec: NOT available (run with --build)")
        return 1
    print(f"native codec: available, ABI v{lib.dsn_abi_version()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
