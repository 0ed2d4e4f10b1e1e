"""Unit tests for bench.py's measured-ceiling cache (pure logic, no TPU).

The cache feeds every *_vs_sustained field in the driver artifact, so
its keying and staleness rules are contract, not plumbing:

  * entries are keyed by (probe, device_kind, machine-id) — a different
    host of the same device_kind must MISS, never silently reuse this
    relay's attenuated ceiling as "measured_cached" (ADVICE r4 medium);
  * each entry is stamped with the headline img/s of the run that
    produced it; a >10% headline drift bypasses the cache and re-probes
    (VERDICT r4 weak #5), falling back to the cached value labeled
    "measured_cached_drift" when the re-probe fails;
  * old-format bare-float entries are accepted and stamped in place.
"""

import importlib.util
import json
import os
import sys

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    """Import bench.py as an isolated module with a temp cache file and
    a fake device (no jax.devices() relay round-trip)."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    # bench.py sets jax compile-cache config at import; harmless here.
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "_CEILING_CACHE", str(tmp_path / "ceil.json"))
    monkeypatch.setattr(mod, "_device_kind", lambda: "FakeTPU")
    monkeypatch.setattr(mod, "_machine_id", lambda: "hostA")
    monkeypatch.delenv("BENCH_REMEASURE_CEILING", raising=False)
    yield mod
    del sys.modules["bench_under_test"]


def test_cache_hit_requires_machine_id(bench, monkeypatch):
    bench._store_ceiling("bf16", 170.0, 700.0)
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=705.0)
    assert (rate, src) == (170.0, "measured_cached")
    # Same device_kind, different machine: MUST miss (falls back, since
    # timeout=0 forbids probing).
    monkeypatch.setattr(bench, "_machine_id", lambda: "hostB")
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=705.0)
    assert (rate, src) == (99.0, "fallback")


def test_drift_bypasses_cache_and_labels_fallback(bench):
    bench._store_ceiling("bf16", 170.0, 700.0)
    # 20% headline drift: the cached entry must not return as
    # "measured_cached".  With no probe budget the cached value is
    # still used, but labeled so the artifact says the stamp is stale.
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=560.0)
    assert (rate, src) == (170.0, "measured_cached_drift")
    # Within 10%: normal cache hit.
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=665.0)
    assert (rate, src) == (170.0, "measured_cached")
    # No headline this run (e.g. int8 stage skipped): cannot judge
    # drift, cache stands.
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=None)
    assert (rate, src) == (170.0, "measured_cached")


def test_old_format_entry_migrates_with_stamp(bench):
    with open(bench._CEILING_CACHE, "w") as f:
        json.dump({bench._cache_key("bf16"): 168.5}, f)
    rate, src = bench._run_probe("x", 99.0, "bf16", timeout=0.0,
                                 headline=690.0)
    assert (rate, src) == (168.5, "measured_cached")
    entry = bench._cached_ceiling("bf16")
    assert entry == {"rate": 168.5, "headline_ips": 690.0}


def test_drift_reprobe_success_restamps(bench, monkeypatch):
    bench._store_ceiling("bf16", 170.0, 700.0)

    def fake_run(cmd, **kw):
        class R:
            stdout = "175.5\n"
        return R()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    rate, src = bench._run_probe("tmpl {cache_dir}", 99.0, "bf16",
                                 timeout=60.0, headline=900.0)
    assert (rate, src) == (175.5, "measured")
    assert bench._cached_ceiling("bf16") == {
        "rate": 175.5, "headline_ips": 900.0,
    }
