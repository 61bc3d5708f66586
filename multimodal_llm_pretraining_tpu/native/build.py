"""Build the native host-side library: ``python -m multimodal_llm_pretraining_tpu.native.build``."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "mlpt_native.cpp")
LIB = os.path.join(HERE, "libmlpt_native.so")


def build(force: bool = False) -> str | None:
    if not force and os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", SRC, "-o", LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed ({e}); python fallbacks remain active", file=sys.stderr)
        return None


if __name__ == "__main__":
    path = build(force=True)
    print(path or "build failed")
