"""Evaluator orchestration tests (reference trackeval/eval.py + run_*.py):
one entry point sweeping several benchmark families, parallel over
sequences, with a unified output tree — results must equal each adapter's
own serial evaluate()."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
MOT_GT = os.path.join(DATA, "mot_mini", "gt", "mot_challenge")
MOT_TRK = os.path.join(DATA, "mot_mini", "trackers", "mot_challenge")
KITTI = os.path.join(DATA, "kitti_mini")
DAVIS = os.path.join(DATA, "davis_mini")


def _datasets():
    from fastervit_tpu.tracking.evaluator import make_dataset
    return [
        ("MOT-MINI", make_dataset("mot", gt_folder=MOT_GT,
                                  trackers_folder=MOT_TRK,
                                  benchmark="MINI", split="train")),
        ("KITTI-MINI", make_dataset(
            "kitti", gt_folder=os.path.join(KITTI, "gt"),
            trackers_folder=os.path.join(KITTI, "trackers"))),
        ("DAVIS-MINI", make_dataset(
            "davis", gt_folder=os.path.join(DAVIS, "gt"),
            trackers_folder=os.path.join(DAVIS, "trackers"))),
    ]


def _assert_tree_close(a, b, path=""):
    assert type(a) is type(b) or (np.isscalar(a) and np.isscalar(b)), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_tree_close(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(a, b, rtol=1e-9, err_msg=path)


@pytest.mark.smoke
def test_serial_sweep_matches_adapters(tmp_path):
    """Evaluator(serial) over 3 families == each adapter's own evaluate."""
    from fastervit_tpu.tracking.evaluator import EvalConfig, Evaluator

    datasets = _datasets()
    ev = Evaluator(EvalConfig(use_parallel=False, print_results=False,
                              time_progress=False,
                              output_folder=str(tmp_path)))
    results, messages = ev.evaluate(datasets)
    for name, ds in datasets:
        want = ds.evaluate()
        assert messages[name] == {t: "Success" for t in want}
        _assert_tree_close(results[name], want, name)
    # unified output tree: per-dataset dirs with summary.json
    for name, _ in datasets:
        summary = os.path.join(str(tmp_path), name, "summary.json")
        assert os.path.isfile(summary), summary
        json.load(open(summary))
    # MOT family also writes the TrackEval-style detailed CSV
    assert os.path.isfile(os.path.join(
        str(tmp_path), "MOT-MINI", "minitracker_detailed.csv"))


def test_parallel_sweep_matches_serial(tmp_path):
    """USE_PARALLEL analog: multiprocessing pool over sequences (MOT
    family) and tracker tasks (others) gives identical results."""
    from fastervit_tpu.tracking.evaluator import EvalConfig, Evaluator

    serial, _ = Evaluator(EvalConfig(
        use_parallel=False, print_results=False,
        time_progress=False)).evaluate(_datasets())
    par, msgs = Evaluator(EvalConfig(
        use_parallel=True, num_parallel_cores=2, print_results=False,
        time_progress=False,
        output_folder=str(tmp_path))).evaluate(_datasets())
    _assert_tree_close(par, serial)
    assert all(m == "Success" for per in msgs.values()
               for m in per.values())


def test_error_isolation():
    """break_on_error=False records the failure and continues (TrackEval
    return_on_error semantics) instead of aborting the sweep."""
    from fastervit_tpu.tracking.evaluator import EvalConfig, Evaluator

    datasets = _datasets()
    ev = Evaluator(EvalConfig(use_parallel=False, print_results=False,
                              time_progress=False, break_on_error=False))
    results, messages = ev.evaluate(datasets,
                                    trackers=["minitracker", "missing"])
    for name, _ in datasets:
        assert messages[name]["minitracker"] == "Success"
        assert messages[name]["missing"] != "Success"
        assert results[name]["missing"] is None


def test_cli_entrypoint(tmp_path):
    """The run_mot_challenge.py-analog CLI: one command, several
    benchmarks, parallel, writes the output tree, exit code 0."""
    cmd = [
        sys.executable, "-m", "fastervit_tpu.tracking.evaluator",
        "--dataset", (f"kind=mot,name=MOT-MINI,benchmark=MINI,split=train,"
                      f"gt_folder={MOT_GT},trackers_folder={MOT_TRK}"),
        "--dataset", (f"kind=kitti,name=KITTI-MINI,"
                      f"gt_folder={os.path.join(KITTI, 'gt')},"
                      f"trackers_folder={os.path.join(KITTI, 'trackers')}"),
        "--dataset", (f"kind=davis,name=DAVIS-MINI,"
                      f"gt_folder={os.path.join(DAVIS, 'gt')},"
                      f"trackers_folder={os.path.join(DAVIS, 'trackers')}"),
        "--parallel", "--cores", "2", "--output", str(tmp_path),
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    for name in ("MOT-MINI", "KITTI-MINI", "DAVIS-MINI"):
        assert os.path.isfile(os.path.join(str(tmp_path), name,
                                           "summary.json"))
    assert "HOTA" in proc.stdout and "J&F" in proc.stdout
