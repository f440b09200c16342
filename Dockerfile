# TPU build/runtime environment for fastervit_tpu (reference Dockerfile:1-8
# pins nvcr.io pytorch + timm; the TPU analog pins a jax[tpu] toolchain).
#
# The native data-loader runtime (fastervit_tpu/data/native) builds lazily at
# first import and needs g++ + libjpeg-dev; everything else is pure Python
# on top of jax/flax/optax/orbax.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libjpeg-dev && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy pillow pyyaml pytest

WORKDIR /workspace/fastervit_tpu
COPY . .
RUN pip install --no-cache-dir -e .

# smoke: model builds + CPU-mesh sharding logic
RUN JAX_PLATFORMS=cpu python -c "import fastervit_tpu as fvt; \
    fvt.create_model('faster_vit_0_224')"
