"""Shared driver plumbing: prefetched image iteration + exit report."""

import sys

import numpy as np


def make_fetcher(paths, raw16=False, depth=8):
    """Returns fetch(i)->f32[H,W] backed by the native C++ prefetch ring
    when available (decodes ahead on background threads), else the Python
    decoder."""
    try:
        from orb_slam_system_tpu.native import PrefetchLoader, available
        if available():
            loader = PrefetchLoader(paths, depth=depth, raw16=raw16)

            def fetch(i):
                img = loader.fetch(i)
                if img is None:
                    raise RuntimeError(f"decode failed: {paths[i]}")
                return img

            return fetch
    except Exception:  # noqa: BLE001 — fall back to pure python
        pass
    if raw16:
        from orb_slam_system_tpu.dataio.datasets import load_depth_raw
        return lambda i: load_depth_raw(paths[i])
    from orb_slam_system_tpu.dataio.datasets import load_image_gray
    return lambda i: load_image_gray(paths[i])


def print_timing_report(track_times):
    """The reference drivers' exit report (mono_tum.cc:111-120)."""
    tt = np.sort(np.asarray(track_times))
    print("-------")
    print(f"median tracking time: {tt[len(tt) // 2]:.5f}")
    print(f"mean tracking time: {tt.mean():.5f}")
