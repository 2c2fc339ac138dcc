#!/usr/bin/env python3
"""Back-compat wrapper: sf1 (10 replicas of sf0.1) via make_sfN.py.

Usage: python3 tools/make_sf1.py [src_dir out_dir replicas]
(kept because round docs / PERF.md reference it; new callers should use
make_sfN.py directly, whose arg order is [replicas] [src] [out]).
"""
import os
import subprocess
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench_sf1"
REP = sys.argv[3] if len(sys.argv) > 3 else "10"

HERE = os.path.dirname(os.path.abspath(__file__))
sys.exit(subprocess.call(
    [sys.executable, os.path.join(HERE, "make_sfN.py"), REP, SRC, OUT]))
