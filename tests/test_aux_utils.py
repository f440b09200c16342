"""Aux parity utilities: timers, plots, per-module LR groups, ciou/diou.

References: dino/util/time_counter.py, TrackEval/_timing.py,
dino/util/plot_utils.py, dino/util/get_param_dicts.py,
dino/util/box_loss.py."""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fastervit_tpu.utils import timing


def test_time_counter_sections():
    tc = timing.TimeCounter()
    with tc.timeit("a"):
        sum(range(1000))
    with tc.timeit("b"):
        sum(range(1000))
    with tc.timeit("a"):
        pass
    assert set(tc.timedict) == {"a", "b"}
    assert all(v >= 0 for v in tc.timedict.values())
    assert "a:" in str(tc)


def test_time_function_flag():
    timing.reset_timing()

    @timing.time_function
    def f():
        return 41 + 1

    timing.DO_TIMING = False
    assert f() == 42
    assert timing.timing_report() == ""
    timing.DO_TIMING = True
    try:
        assert f() == 42
        assert "f" in timing.timing_report()
    finally:
        timing.DO_TIMING = False
        timing.reset_timing()


def test_jax_trace_saves_artifact(tmp_path, cpu_devices):
    """jax_trace writes a loadable profiler artifact (SURVEY §5.1: the
    reference story is torch.profiler; ours is jax.profiler — on-chip use is
    gated behind a flag because the device relay hangs it, but the trace
    path itself must produce a real artifact)."""
    import glob

    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with timing.jax_trace(d):
        jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))).block_until_ready()
    artifacts = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True) + \
        glob.glob(f"{d}/**/*.xplane.pb", recursive=True)
    assert artifacts, f"no trace artifact under {d}"


def test_jax_trace_none_noop():
    with timing.jax_trace(None):
        pass


def test_plot_summaries(tmp_path):
    pytest.importorskip("matplotlib")
    from fastervit_tpu.utils.metrics import update_summary
    from fastervit_tpu.utils.plot import plot_summaries

    p = tmp_path / "summary.csv"
    for e in range(3):
        update_summary(e, {"loss": 2.0 - 0.5 * e, "img_s": 100.0},
                       {"loss": 1.9 - 0.5 * e, "top1": 10.0 * e, "top5": 20.0},
                       str(p), write_header=(e == 0))
    out = tmp_path / "curves.png"
    plot_summaries([str(p)], output=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_detection_param_labels_and_optimizer():
    from fastervit_tpu.detection.engine import (create_detection_optimizer,
                                                detection_param_labels)

    params = {
        "backbone": {"stem": {"kernel": jnp.ones((2, 2))}},
        "transformer": {"sampling_offsets": {"kernel": jnp.ones((2, 2))},
                        "fc": {"kernel": jnp.ones((2, 2))}},
    }
    labels = detection_param_labels(params,
                                    linear_proj_names=("sampling_offsets",))
    assert labels["backbone"]["stem"]["kernel"] == "backbone"
    assert labels["transformer"]["sampling_offsets"]["kernel"] == "linear_proj"
    assert labels["transformer"]["fc"]["kernel"] == "main"

    import jax
    tx = create_detection_optimizer(params, lr=1e-2, lr_backbone=1e-4,
                                    linear_proj_names=("sampling_offsets",),
                                    lr_linear_proj_mult=0.1)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # group LRs differ: backbone steps ~100x smaller than main
    mag = lambda u: float(jnp.abs(u).mean())
    assert mag(updates["backbone"]["stem"]["kernel"]) < \
        mag(updates["transformer"]["fc"]["kernel"])
    assert mag(updates["transformer"]["sampling_offsets"]["kernel"]) < \
        mag(updates["transformer"]["fc"]["kernel"])


def test_ciou_diou_vs_torch_reference():
    torch = pytest.importorskip("torch")
    from fastervit_tpu.ops.boxes import ciou_loss, diou_loss

    def t_terms(b1, b2):
        b1, b2 = torch.sigmoid(b1), torch.sigmoid(b2)
        w1, h1 = torch.exp(b1[:, 2]), torch.exp(b1[:, 3])
        w2, h2 = torch.exp(b2[:, 2]), torch.exp(b2[:, 3])
        cx1, cy1, cx2, cy2 = b1[:, 0], b1[:, 1], b2[:, 0], b2[:, 1]
        inter = ((torch.min(cx1 + w1 / 2, cx2 + w2 / 2)
                  - torch.max(cx1 - w1 / 2, cx2 - w2 / 2)).clamp(min=0)
                 * (torch.min(cy1 + h1 / 2, cy2 + h2 / 2)
                    - torch.max(cy1 - h1 / 2, cy2 - h2 / 2)).clamp(min=0))
        union = w1 * h1 + w2 * h2 - inter
        iou = inter / union
        c_diag = ((torch.max(cx1 + w1 / 2, cx2 + w2 / 2)
                   - torch.min(cx1 - w1 / 2, cx2 - w2 / 2)).clamp(min=0) ** 2
                  + (torch.max(cy1 + h1 / 2, cy2 + h2 / 2)
                     - torch.min(cy1 - h1 / 2, cy2 - h2 / 2)).clamp(min=0) ** 2)
        u = ((cx2 - cx1) ** 2 + (cy2 - cy1) ** 2) / c_diag
        return iou, u, (w1, h1, w2, h2)

    rng = np.random.RandomState(0)
    a = rng.randn(64, 4).astype(np.float32)
    b = rng.randn(64, 4).astype(np.float32)
    ta, tb = torch.tensor(a), torch.tensor(b)
    iou, u, (w1, h1, w2, h2) = t_terms(ta, tb)
    v = (4 / math.pi ** 2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
    s = (iou > 0.5).float()
    alpha = s * v / (1 - iou + v)
    ref_ciou = (1 - torch.clamp(iou - u - alpha * v, -1.0, 1.0)).numpy()
    ref_diou = (1 - torch.clamp(iou - u, -1.0, 1.0)).numpy()
    np.testing.assert_allclose(np.asarray(ciou_loss(jnp.asarray(a),
                                                    jnp.asarray(b))),
                               ref_ciou, atol=5e-6)
    np.testing.assert_allclose(np.asarray(diou_loss(jnp.asarray(a),
                                                    jnp.asarray(b))),
                               ref_diou, atol=5e-6)
