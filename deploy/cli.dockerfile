# Standalone CLI image (parity: scripts/cli.dockerfile — the reference's
# boa-cli image off nvcr pytorch; TPU base here). Build context = repo root:
#   docker build -f deploy/cli.dockerfile -t boa-tpu-cli .
# Run:
#   docker run --rm --privileged -v /data:/data boa-tpu-cli \
#     --input-image /data/ct.nii.gz --output-dir /data/out --models total+bca
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libgomp1 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml /app/
COPY boa_tpu /app/boa_tpu
COPY native /app/native

# TPU-enabled jax + CLI deps (no PACS plumbing in this image)
RUN pip install --no-cache-dir "jax[tpu]" -f \
      https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir pandas scipy opencv-python-headless \
       matplotlib \
    && pip install --no-cache-dir -e /app

# pre-build the native CC/codec library so first use needs no toolchain
RUN python -c "from boa_tpu import native; assert native.get_lib()"

# bake model weights into the image at build time when network access to
# the weight store is available (parity: scripts/download_weights.py)
# RUN python -m boa_tpu.weights.manager download total total_fast bca

ENV BOA_WEIGHTS_PATH=/weights
VOLUME ["/weights"]

ENTRYPOINT ["python", "-m", "boa_tpu"]
