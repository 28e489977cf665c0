"""Build libhostops.so from csrc/hostops.cpp.

Usage:  python -m tgb_tgn_dgl_tpu.data.build_hostops

The role of the reference's `python setup.py build_ext --inplace` step
(reference README.md:1-2, which built the external TGL Cython sampler).
Plain g++ — no build system needed for one translation unit.
"""
from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    csrc = os.path.join(here, "..", "csrc")
    srcs = [os.path.join(csrc, "hostops.cpp"),
            os.path.join(csrc, "packer.cpp"),
            os.path.join(csrc, "owned_state.cpp")]
    out = os.path.join(csrc, "libhostops.so")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", out, *srcs,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_if_needed() -> bool:
    """Build when the .so is missing or older than the source; returns
    availability.  Never raises — callers fall back to numpy."""
    here = os.path.dirname(os.path.abspath(__file__))
    csrc = os.path.join(here, "..", "csrc")
    srcs = [os.path.join(csrc, "hostops.cpp"),
            os.path.join(csrc, "packer.cpp"),
            os.path.join(csrc, "owned_state.cpp")]
    out = os.path.join(csrc, "libhostops.so")
    try:
        if (not os.path.exists(out)
                or any(os.path.getmtime(out) < os.path.getmtime(s)
                       for s in srcs)):
            build(verbose=False)
        return True
    except Exception:
        return False


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    from . import hostops
    sys.exit(0 if hostops.available() else 1)
