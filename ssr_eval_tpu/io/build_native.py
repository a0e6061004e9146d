"""Build the native ssrio library: `python -m ssr_eval_tpu.io.build_native`."""

import os
import subprocess
import sys


def build():
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    native = os.path.join(root, "native")
    if not os.path.isdir(native):
        print("native/ source directory not found", file=sys.stderr)
        return 1
    rc = subprocess.call(["make", "-C", native])
    if rc == 0:
        from ssr_eval_tpu.io import flac_native  # noqa: F401 — smoke import

        print("ssrio built and loadable:", flac_native._LIB_PATH)
    return rc


if __name__ == "__main__":
    raise SystemExit(build())
