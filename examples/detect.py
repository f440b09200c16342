"""Detection: FasterViT pyramid + DINO-style detector on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import fastervit_tpu as fvt
from fastervit_tpu.detection.dino import DINODetector, postprocess
from fastervit_tpu.detection.engine import train_detection_epoch

cfg = fvt.get_config("faster_vit_0_224", resolution=256)
det = DINODetector(backbone_cfg=cfg, num_classes=91, num_queries=300,
                   enc_layers=3, dec_layers=3)
x = jnp.zeros((2, 256, 256, 3))
variables = dict(det.init(jax.random.PRNGKey(0), x))

# inference + top-k postprocess
out = det.apply(variables, x)
res = postprocess(out, jnp.asarray([[256, 256]] * 2), num_select=100)
print("boxes:", res["boxes"].shape)

# one training epoch over synthetic targets
targets = [{"labels": np.array([3]), "boxes": np.array([[0.5, 0.5, 0.3, 0.3]])}
           for _ in range(2)]
tx = optax.adamw(1e-4)
variables, _, metrics = train_detection_epoch(
    det, variables, tx.init(variables["params"]), tx,
    [(np.zeros((2, 256, 256, 3), np.float32), targets)])
print("detection loss:", metrics["loss"])
