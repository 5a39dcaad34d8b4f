"""Round-4: re-trace the GAN train step at HEAD (post gp_rof default).

Thin wrapper over scripts/trace_trainstep_r3.py — same step construction and
perfetto parsing, new output paths, so the round-4 attribution (after the
reverse-over-forward WGAN-GP became the default) lands in its own artifact.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_trainstep_r4.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import trace_trainstep_r3 as r3

r3.OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "trainstep_trace_r4.json")
r3.TRACE_DIR = "/tmp/ts_trace_r4"

if __name__ == "__main__":
    sys.exit(r3.main())
