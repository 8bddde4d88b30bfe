"""Super-linearity gate of the 10x scale smoke (tools/scale_smoke.py).

Pure-arithmetic unit tests: the gate must pass every honest linear scaler
(including the historical worst, a scan-bound agg at 12.7x under factor
10) and fail a synthetic quadratic operator loudly.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "scale_smoke",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "scale_smoke.py"),
)
scale_smoke = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_smoke)


def test_linear_scalers_pass():
    base = {"scan_agg": 0.4, "index_served": 0.5, "fixed_cost": 4.6}
    scaled = {"scan_agg": 5.08,      # 12.7x — the historical worst honest case
              "index_served": 0.9,   # sub-2x, index-served
              "fixed_cost": 4.8}     # flat at 10x = pure fixed cost
    assert scale_smoke.ratio_flags(base, scaled, factor=10) == {}


def test_quadratic_fixture_fails():
    # a quadratic operator lands near factor^2 = 100x the base time
    base = {"allpairs": 0.3, "ok": 1.0}
    scaled = {"allpairs": 30.0, "ok": 9.0}
    flags = scale_smoke.ratio_flags(base, scaled, factor=10)
    assert set(flags) == {"allpairs"}
    assert flags["allpairs"]["ratio"] == 100.0
    assert flags["allpairs"]["bar"] == 15.0


def test_subsecond_noise_exempt():
    # 0.02s -> 0.9s is a 45x "ratio" made of per-job fixed cost, not
    # scaling signal — exempt below the floor
    assert scale_smoke.ratio_flags({"tiny": 0.02}, {"tiny": 0.9},
                                   factor=10) == {}
    # but the same ratio above the floor is flagged
    assert set(scale_smoke.ratio_flags({"tiny": 0.1}, {"tiny": 4.5},
                                       factor=10)) == {"tiny"}
