"""Pins bench.py's recorder-facing output contract.

Round 5's official bench record was lost (BENCH_r05.json `"parsed":
null`) because the ~4 KB scaling section was inlined into the single
stdout JSON line and the external recorder's bounded stdout-tail capture
truncated it mid-object. These tests make that bug class fail locally:

- the stdout payload has exactly the recorder's known-good round-4 shape
  (metric/value/unit/queries/ann/sf) — never a scaling key;
- its serialized size stays far below the observed ~2.2 KB capture
  window even with worst-plausible timing values for every headline
  query;
- the scaling measurement goes to a SCALING_r{N}.json sidecar whose
  round number is one past the highest recorded BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os

import bench

# the recorder's stored tail was ~2.2 KB; leave real margin below it
_CAPTURE_BUDGET_BYTES = 2000


def _worst_case_payload() -> dict:
    # 999.999 is wider than any plausible per-query seconds value at
    # sf0.1 (historical worst single query: ~2.2 s)
    timings = {name: 999.999 for name in bench.HEADLINE}
    # every index-backed query reports a build/search split — use the
    # live module-level set so the worst case can't silently lag it
    # (it did: this dict hardcoded 3 names after ANN_INDEXED grew to 5)
    ann = {
        name: {"build": 999.999, "search": 999.999}
        for name in bench.ANN_INDEXED
    }
    # worst-case noise: every query maximally noisy — the summary stays
    # compact by construction (median/max + the 4 noisiest names)
    spreads = {name: 9.999 for name in bench.HEADLINE}
    return bench.build_payload(timings, ann, 0.1, spreads)


def test_payload_shape_is_the_recorder_contract():
    payload = _worst_case_payload()
    assert set(payload) == {
        "metric", "value", "unit", "queries", "ann", "noise", "sf",
    }
    assert "scaling" not in payload
    assert payload["metric"] == "headline_queries_total_runtime"
    assert payload["unit"] == "sec"
    assert set(payload["queries"]) == set(bench.HEADLINE)


def test_payload_line_fits_capture_window_at_worst_case():
    line = json.dumps(_worst_case_payload())
    assert len(line.encode()) < _CAPTURE_BUDGET_BYTES, (
        f"stdout line would be {len(line)}B — over the recorder's capture "
        f"window; trim the headline set or the payload shape"
    )


def test_scaling_sidecar_names_the_current_round(tmp_path, monkeypatch):
    # with BENCH_r01..r05 on disk the sidecar for the in-flight round is
    # SCALING_r06.json
    # use bench's own record parser — the ONE place that knows the
    # naming (a naive filename split chokes on the driver's low-core
    # sidecar records like BENCH_r13_c8.json, which are not rounds)
    rounds = [n for n, _ in bench._recorded_rounds()]
    assert rounds, "driver bench records missing from repo root"
    expect = f"SCALING_r{rounds[-1] + 1:02d}.json"
    assert os.path.basename(bench._scaling_sidecar_path()) == expect


def test_build_payload_total_is_sum_of_timings():
    payload = bench.build_payload({"a": 1.0, "b": 2.5}, {}, 0.1)
    assert payload["value"] == 3.5


def test_scaled_dirs_materialize_once_and_rebuild_on_drift(
    tmp_path, monkeypatch
):
    """The persisted scale dirs are built exactly once per (source
    fingerprint, synthesizer version) and rebuilt when either drifts —
    the r6 scaling-corpus artifact came from a fresh in-process
    synthesis every sweep, so staleness detection is the whole point."""
    src = tmp_path / "sf0.1"
    src.mkdir()
    (src / "lineitem.parquet").write_bytes(b"x" * 10)
    scale_root = tmp_path / "scale"
    monkeypatch.setenv("SPARK_GRAFT_SCALE_DIR", str(scale_root))
    monkeypatch.setattr(bench, "SF_DIR", str(src))
    calls = []
    monkeypatch.setattr(
        bench,
        "synthesize_scaled_dir",
        lambda spark, s, d, copies, tables=None: calls.append((d, copies)),
    )

    x3, x10, x20, x40 = bench._ensure_scaled_dirs(spark=None)
    assert [c[1] for c in calls] == [3, 10]
    assert x3.endswith("x3") and x10.endswith("x10")
    assert x20 is None  # opt-in only (SPARK_GRAFT_TAU_X20)
    assert x40 is None  # opt-in only (SPARK_GRAFT_TAU_X40)

    bench._ensure_scaled_dirs(spark=None)  # markers match: no rebuild
    assert len(calls) == 2

    # source regenerated (size change) -> fingerprint drift -> rebuild
    (src / "lineitem.parquet").write_bytes(b"y" * 20)
    bench._ensure_scaled_dirs(spark=None)
    assert len(calls) == 4

    # synthesizer version bump -> rebuild
    monkeypatch.setattr(bench, "_SYNTH_VERSION", bench._SYNTH_VERSION + 1)
    bench._ensure_scaled_dirs(spark=None)
    assert len(calls) == 6

    # opt-in x20 (VERDICT r10 #6): builds ONLY the missing 20-copy dir
    _, _, x20, _ = bench._ensure_scaled_dirs(spark=None, with_x20=True)
    assert x20 is not None and x20.endswith("x20")
    assert [c[1] for c in calls[6:]] == [20]

    # opt-in x40 (VERDICT r12 #5): embeddings-only deep-tau dir
    _, _, _, x40 = bench._ensure_scaled_dirs(spark=None, with_x40=True)
    assert x40 is not None and x40.endswith("x40")
    assert [c[1] for c in calls[7:]] == [40]
