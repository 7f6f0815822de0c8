#!/usr/bin/env python
"""Pre-populate the persistent XLA compilation cache for serving.

Thin CLI over orb_slam_system_tpu.utils.warmup.warm() (the same pass
System(..., prewarm=True) runs at construction). Run once per deployment
target — or ship ~/.cache/orb_slam_tpu_xla with the image — to remove
the first-run compile cliff (docs/ROADMAP.md round-4 TPU profiles:
cold 0.2 fps vs warm 19.2 fps on the KF-heavy async profile).

Usage: python tools/warm_cache.py [n_frames_per_pass]
       (no env overrides -> warms the real TPU backend's cache)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.utils.warmup import warm  # noqa: E402

if __name__ == "__main__":
    warm(int(sys.argv[1]) if len(sys.argv) > 1 else 72)
