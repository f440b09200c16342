"""Import the reference PyTorch DINO deformable transformer
(/root/reference/downstream/object_detection/dino) as a torch oracle for
parity tests.

The reference imports two things the test environment can't provide:
`util.misc` (pulls in torchvision) and the compiled CUDA extension
`MultiScaleDeformableAttention`. Both are stubbed — util.misc with the two
symbols actually used (inverse_sigmoid, NestedTensor-free), and the CUDA
extension with a forward that delegates to the repo's own pure-PyTorch
reference `ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func
.py:41-61). Test-only: the reference is the oracle, never a dependency.
"""
import importlib
import importlib.machinery
import importlib.util
import sys
import types

_DINO_ROOT = "/root/reference/downstream/object_detection/dino"


def _package_shell(name: str, path: str):
    """Register an empty package whose submodules resolve from `path`
    (skips the real __init__.py — used where it would pull torchvision)."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    mod = importlib.util.module_from_spec(spec)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def _package_real(name: str, path: str):
    """Register a package executing its real __init__.py."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, path + "/__init__.py", submodule_search_locations=[path])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_dino_transformer():
    """Return the reference `models.dino.deformable_transformer` module."""
    if "models.dino.deformable_transformer" in sys.modules:
        return sys.modules["models.dino.deformable_transformer"]

    import torch

    # --- util.misc stub (torchvision-free) ------------------------------
    util = types.ModuleType("util")
    util_misc = types.ModuleType("util.misc")

    def inverse_sigmoid(x, eps=1e-3):
        x = x.clamp(min=0, max=1)
        x1 = x.clamp(min=eps)
        x2 = (1 - x).clamp(min=eps)
        return torch.log(x1 / x2)

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors = tensors
            self.mask = mask

        def decompose(self):
            return self.tensors, self.mask

    util_misc.inverse_sigmoid = inverse_sigmoid
    util_misc.NestedTensor = NestedTensor
    util.misc = util_misc
    sys.modules.setdefault("util", util)
    sys.modules.setdefault("util.misc", util_misc)

    # --- CUDA extension stub (filled after the functions module loads) --
    msda_stub = types.ModuleType("MultiScaleDeformableAttention")
    sys.modules.setdefault("MultiScaleDeformableAttention", msda_stub)

    # --- spoofed package tree over the reference source ------------------
    _package_shell("models", _DINO_ROOT + "/models")
    _package_shell("models.dino", _DINO_ROOT + "/models/dino")
    _package_shell("models.dino.ops", _DINO_ROOT + "/models/dino/ops")

    func_mod = importlib.import_module(
        "models.dino.ops.functions.ms_deform_attn_func")
    core = func_mod.ms_deform_attn_core_pytorch

    def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                               sampling_locations, attention_weights,
                               im2col_step):
        return core(value, spatial_shapes, sampling_locations,
                    attention_weights)

    msda_stub.ms_deform_attn_forward = ms_deform_attn_forward

    # now the real subpackage __init__s can execute (they import the
    # Function, whose module-level `import MultiScaleDeformableAttention`
    # already resolved to the stub)
    _package_real("models.dino.ops.functions",
                  _DINO_ROOT + "/models/dino/ops/functions")
    _package_real("models.dino.ops.modules",
                  _DINO_ROOT + "/models/dino/ops/modules")

    return importlib.import_module("models.dino.deformable_transformer")
