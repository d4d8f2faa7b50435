"""Toolchain-bisection diagnostics for the int16 Pallas kernel (consolidated
from the round-3/4 _probe_i16*.py scripts; VERDICT r4 hygiene item).

Each stage is a standalone probe that was used to bisect which int16
constructs crash the axon service-side Mosaic build (see BENCH.md "int16
kernel" and pallas_dp.py's comments).  Run one stage against the real
backend with:

    python -m benchmarks.probe_i16 <stage>

where <stage> is one of: a b c d e f g h i  (historical bisection order).
"""

import runpy
import sys
import os

_HERE = os.path.dirname(__file__)

def main():
    stages = sorted(
        f[:-3] for f in os.listdir(_HERE) if f.endswith(".py") and len(f) == 4
    )
    if len(sys.argv) != 2 or sys.argv[1] not in stages:
        print(f"usage: python -m benchmarks.probe_i16 [{'|'.join(stages)}]")
        return 2
    runpy.run_path(os.path.join(_HERE, sys.argv[1] + ".py"), run_name="__main__")
    return 0

if __name__ == "__main__":
    sys.exit(main())
