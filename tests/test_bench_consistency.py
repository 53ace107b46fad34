"""Timing-consistency guard (VERDICT r4 next #7).

CPU part: check_consistency must flag the exact pathologies BENCH_r04
carried (fwd > fwd+bwd, stage sum wildly off the composed step) and pass a
physically sensible artifact.

HW part (tpu_hw): run bench.selftest() — one chained composed train step vs
the chained raster stage sum; >30% disagreement fails loudly so a timing
regression can never silently poison a round artifact again.
"""

import pytest


def _load_bench():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


class TestCheckConsistency:
    def test_flags_impossible_fwd_gt_fwdbwd(self):
        bench = _load_bench()
        res = {"attention_131k": {
            "bf16_split3": {"fwd_ms": 30.747, "fwd_bwd_ms": 7.893}}}
        out = bench.check_consistency(res)
        assert not out["ok"]
        assert "impossible" in out["violations"][0]

    def test_flags_stage_sum_disagreement(self):
        bench = _load_bench()
        res = {
            "raster_stages": {"a": 32.9, "b": 29.87, "c": 20.85},
            "gs_train_step_ms": 50.29,
        }
        out = bench.check_consistency(res)
        assert not out["ok"]
        assert any("raster_stages sum" in v for v in out["violations"])

    def test_passes_honest_artifact(self):
        bench = _load_bench()
        # the round-4 BASELINE.md chained numbers
        res = {
            "attention_131k": {
                "f32": {"fwd_ms": 5.7, "fwd_bwd_ms": 14.5},
                "bf16_split3": {"fwd_ms": 3.67, "fwd_bwd_ms": 7.8},
            },
            "raster_stages": {
                "depth-sort+permute": 1.46, "fused_pair_keys": 1.78,
                "key sort": 5.55, "segment starts": 1.84,
                "compact row gather": 3.33, "fwd kernel": 9.65,
                "bwd kernel": 14.43, "bwd gidx routing": 5.14,
            },
            "gs_train_step_ms": 49.2,
            "compositing_kernel": {"ms": 9.9, "bwd_ms": 14.0},
        }
        out = bench.check_consistency(res)
        assert out["ok"], out["violations"]
        assert res["raster_stages_sum_ms"] == pytest.approx(43.18, abs=0.01)


@pytest.mark.tpu_hw
def test_selftest_on_hardware():
    bench = _load_bench()
    assert bench.selftest() == 0
