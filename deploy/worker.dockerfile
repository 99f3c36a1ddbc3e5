# TPU worker image (parity: scripts/worker_gpu.dockerfile, TPU base instead
# of nvcr pytorch). Build context is the repo root.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgomp1 gosu && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml /app/
COPY boa_tpu /app/boa_tpu
COPY native /app/native

# TPU-enabled jax + service deps
RUN pip install --no-cache-dir "jax[tpu]" -f \
      https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir celery psycopg2-binary smbclient pandas \
       scipy opencv-python-headless matplotlib \
    && pip install --no-cache-dir -e /app

# bake model weights into the image (parity: scripts/download_weights.py)
# RUN python -m boa_tpu.weights.manager download total total_fast bca

COPY deploy/entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh
ENTRYPOINT ["/entrypoint.sh"]
