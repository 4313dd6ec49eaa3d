"""Fuzz the native host codec under ASAN+UBSAN.

The serving daemon decodes untrusted HTTP bytes through
deepsee_tpu/native/codec.cpp; this script is the hardening gate for that
surface (the reference's equivalent surface is PIL decode,
data/base_dataset.py:87-95, which has had decades of fuzzing).

  python scripts/fuzz_codec.py [--iterations N] [--seed N] [--keep]

1. builds the sanitized harness (`make -C deepsee_tpu/native fuzz`),
2. generates a PIL seed corpus (JPEG/PNG across color types, bit depths,
   progressive/interlaced, degenerate sizes) plus the checked-in regression
   corpus tests/data/codec_corpus/*,
3. runs the deterministic mutating harness; any ASAN/UBSAN finding aborts
   with the reproducer left at <work>/current.bin.

Exit 0 = clean.  A reproducer should be minimized and checked into
tests/data/codec_corpus/ so tests/test_native_codec.py pins the fix.
"""

import argparse
import glob
import io
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "deepsee_tpu", "native")
CORPUS = os.path.join(REPO, "tests", "data", "codec_corpus")


def make_seeds(seed_dir: str) -> int:
    rng = np.random.RandomState(0)
    seeds = []

    def rgb(w, h):
        return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)

    def save(img: Image.Image, fmt: str, **kw) -> None:
        buf = io.BytesIO()
        img.save(buf, format=fmt, **kw)
        seeds.append(buf.getvalue())

    save(Image.fromarray(rgb(37, 29)), "JPEG", quality=90)
    save(Image.fromarray(rgb(64, 64)), "JPEG", quality=35, progressive=True)
    save(Image.fromarray(rgb(16, 16)).convert("L"), "JPEG", quality=85)
    save(Image.fromarray(rgb(8, 300)), "JPEG", quality=95)  # extreme aspect
    save(Image.fromarray(rgb(1, 1)), "JPEG")
    save(Image.fromarray(rgb(48, 31)), "PNG")
    save(Image.fromarray(rgb(33, 33)).convert("L"), "PNG")
    save(Image.fromarray(rgb(24, 24)).convert("P"), "PNG")  # palette
    save(Image.fromarray(rgb(20, 20)).convert("1"), "PNG")  # 1-bit
    save(Image.fromarray(rgb(12, 12)).convert("RGBA"), "PNG")
    save(Image.fromarray(
        rng.randint(0, 65536, (14, 14), dtype=np.uint16), mode="I;16"),
        "PNG")  # 16-bit (UNSUPPORTED path)
    save(Image.fromarray(rgb(40, 26)), "PNG", interlace=True)
    seeds.append(b"\xff\xd8")  # bare JPEG SOI (empty input is covered by
    # the truncate mutator, and an empty seed file would read as a gap)
    seeds.append(b"\x89PNG\r\n\x1a\n")  # bare PNG magic

    # checked-in regression corpus (past crashers / interesting inputs)
    for path in sorted(glob.glob(os.path.join(CORPUS, "*.bin"))):
        with open(path, "rb") as f:
            seeds.append(f.read())

    for i, data in enumerate(seeds):
        with open(os.path.join(seed_dir, f"seed_{i:03d}"), "wb") as f:
            f.write(data)
    return len(seeds)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=50000)
    ap.add_argument("--seed", type=int, default=0, help="extra RNG entropy")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir (seeds + reproducer)")
    args = ap.parse_args()

    build = subprocess.run(["make", "-C", NATIVE, "fuzz"],
                           capture_output=True, text=True)
    if build.returncode != 0:
        print(build.stdout, build.stderr, sep="\n")
        return 2

    work = tempfile.mkdtemp(prefix="deepsee_fuzz_")
    seed_dir = os.path.join(work, "seeds")
    os.makedirs(seed_dir)
    n = make_seeds(seed_dir)
    print(f"[fuzz_codec] {n} seeds -> {seed_dir}")

    proc = subprocess.run(
        [os.path.join(NATIVE, "fuzz_codec"), seed_dir,
         str(args.iterations), work, str(args.seed)],
        text=True)
    repro = os.path.join(work, "current.bin")
    if proc.returncode != 0:
        print(f"[fuzz_codec] FINDING (rc={proc.returncode}); "
              f"reproducer: {repro}")
        print("Minimize it and check it into tests/data/codec_corpus/.")
        return proc.returncode
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(f"[fuzz_codec] clean: {args.iterations} iterations, "
          f"ASAN+UBSAN, 0 findings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
