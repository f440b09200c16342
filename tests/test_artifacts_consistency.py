"""Committed perf artifacts must be mutually consistent (VERDICT r3 #3:
two rounds shipped self-contradicting perf JSONs; this gate fails the
suite when the committed artifact set disagrees with itself)."""
import os
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_committed_artifacts_consistent():
    from check_artifacts import run_all
    errors = run_all(REPO)
    assert not errors, "\n".join(errors)


def test_checker_catches_contradiction(tmp_path):
    """The gate itself must reject a stage-sum that contradicts the bench
    row (the exact round-3 failure shape)."""
    import json

    from check_artifacts import run_all
    (tmp_path / "BENCH_FAMILY.json").write_text(json.dumps(
        [{"model": "faster_vit_4_21k_768", "img_s": 36.1, "batch": 16}]))
    (tmp_path / "PROFILE_CLS.json").write_text(json.dumps(
        {"model": "faster_vit_4_21k_768", "img_s_from_sum": 0.2}))
    errors = run_all(str(tmp_path))
    assert any("PROFILE_CLS" in e for e in errors)

    # current schema: full-model row contradicting the bench row, and a
    # stage sum contradicting the full-model row, must both be caught
    (tmp_path / "PROFILE_CLS.json").write_text(json.dumps(
        [{"model": "faster_vit_4_21k_768", "img_s_full": 0.2,
          "sum_stages_ms": 100.0, "full_ms": 500.0}]))
    errors = run_all(str(tmp_path))
    assert sum("PROFILE_CLS" in e for e in errors) == 2
