"""Import the reference PyTorch MOTRv2 deformable transformer
(/root/reference/downstream/object_tracking/motrv2/models/
deformable_transformer_plus.py) as a torch oracle for parity tests.

Same recipe as tests/dino_reference_loader.py: the CUDA MSDA extension is
stubbed with the repo's own pure-PyTorch `ms_deform_attn_core_pytorch`, and
the handful of util imports are stubbed. Because both reference trees use
the `models`/`util` package names, the MOTR modules are imported under a
save/restore of sys.modules so the two oracles coexist in one test session.
Test-only: the reference is the oracle, never a dependency.
"""
import importlib
import importlib.machinery
import importlib.util
import sys
import types

_MOTR_ROOT = "/root/reference/downstream/object_tracking/motrv2"

_CLASH = ("models", "models.structures", "models.ops", "models.ops.modules",
          "models.ops.functions", "models.ops.functions.ms_deform_attn_func",
          "models.ops.modules.ms_deform_attn",
          "models.deformable_transformer_plus",
          "util", "util.misc", "util.box_ops")

_cached = None


def _package_shell(name: str, path: str):
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    mod = importlib.util.module_from_spec(spec)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def _package_real(name: str, path: str):
    spec = importlib.util.spec_from_file_location(
        name, path + "/__init__.py", submodule_search_locations=[path])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_motr_transformer():
    """Return the reference `models.deformable_transformer_plus` module."""
    global _cached
    if _cached is not None:
        return _cached

    import torch

    saved = {n: sys.modules.pop(n) for n in _CLASH if n in sys.modules}
    try:
        # --- util stubs --------------------------------------------------
        util = types.ModuleType("util")
        util_misc = types.ModuleType("util.misc")

        def inverse_sigmoid(x, eps=1e-5):
            x = x.clamp(min=0, max=1)
            return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

        util_misc.inverse_sigmoid = inverse_sigmoid
        util_box_ops = types.ModuleType("util.box_ops")

        def box_cxcywh_to_xyxy(b):
            cx, cy, w, h = b.unbind(-1)
            return torch.stack([cx - 0.5 * w, cy - 0.5 * h,
                                cx + 0.5 * w, cy + 0.5 * h], dim=-1)

        util_box_ops.box_cxcywh_to_xyxy = box_cxcywh_to_xyxy
        util.misc = util_misc
        util.box_ops = util_box_ops
        sys.modules["util"] = util
        sys.modules["util.misc"] = util_misc
        sys.modules["util.box_ops"] = util_box_ops

        # --- models.structures stub (imported, unused on our path) ------
        structures = types.ModuleType("models.structures")
        structures.Boxes = object
        structures.matched_boxlist_iou = lambda *a, **k: None
        structures.pairwise_iou = lambda *a, **k: None

        # --- CUDA extension stub ----------------------------------------
        if "MultiScaleDeformableAttention" not in sys.modules:
            sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
                "MultiScaleDeformableAttention")
        msda_stub = sys.modules["MultiScaleDeformableAttention"]

        _package_shell("models", _MOTR_ROOT + "/models")
        sys.modules["models.structures"] = structures
        _package_shell("models.ops", _MOTR_ROOT + "/models/ops")

        func_mod = importlib.import_module(
            "models.ops.functions.ms_deform_attn_func")
        core = func_mod.ms_deform_attn_core_pytorch

        def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                                   sampling_locations, attention_weights,
                                   im2col_step):
            return core(value, spatial_shapes, sampling_locations,
                        attention_weights)

        msda_stub.ms_deform_attn_forward = ms_deform_attn_forward

        _package_real("models.ops.functions",
                      _MOTR_ROOT + "/models/ops/functions")
        _package_real("models.ops.modules",
                      _MOTR_ROOT + "/models/ops/modules")

        mod = importlib.import_module("models.deformable_transformer_plus")
        _cached = mod
        return mod
    finally:
        for n in _CLASH:
            sys.modules.pop(n, None)
        sys.modules.update(saved)


def load_motr_qim():
    """Return the reference `models.qim` module (QueryInteractionModulev2)."""
    import torch

    saved = {n: sys.modules.pop(n) for n in _CLASH + ("models.qim",)
             if n in sys.modules}
    try:
        util = types.ModuleType("util")
        util.box_ops = types.ModuleType("util.box_ops")
        sys.modules["util"] = util
        sys.modules["util.box_ops"] = util.box_ops
        structures = types.ModuleType("models.structures")
        structures.Boxes = object
        structures.Instances = object
        structures.pairwise_iou = lambda *a, **k: None
        _package_shell("models", _MOTR_ROOT + "/models")
        sys.modules["models.structures"] = structures
        return importlib.import_module("models.qim")
    finally:
        for n in _CLASH + ("models.qim",):
            sys.modules.pop(n, None)
        sys.modules.update(saved)
