"""Full in-the-wild loop closure (long; env-gated).

Runs ~13 minutes on this 1-core CPU host, so it only executes when
ORB_SLAM_RUN_LONG_E2E=1; the default suite covers loop closing through
tests/test_loop_correction.py (constructed drift) and the candidate-
rejection behavior inside the standard circle runs.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("ORB_SLAM_RUN_LONG_E2E"),
                    reason="long e2e; set ORB_SLAM_RUN_LONG_E2E=1")
def test_loop_closes_in_the_wild():
    from examples.loop_synthetic import run
    slam, rmse, n_tracked = run(n_frames=170, verbose=False)
    assert slam.loop_closer.n_loops_closed >= 1
    assert n_tracked >= 160
    assert rmse < 0.10
