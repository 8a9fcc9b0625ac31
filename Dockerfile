# Serving image for the tone_tpu websocket ASR demo on a Cloud TPU VM.
#
# TPU-native counterpart of the reference's demo image
# (/root/reference/Dockerfile: poetry build -> `python -m tone download` ->
# uvicorn tone.demo.website).  Differences are deliberate:
#   * the compute runtime is jax[tpu] (libtpu via the pip release), not
#     onnxruntime — the container must run on a TPU VM with /dev/accel*
#     visible (use --privileged or the device mappings in
#     scripts/docker-compose.yml);
#   * the server is the batched multi-stream engine (`tone-tpu serve`),
#     not a one-request-at-a-time uvicorn app.
#
# Build:  docker build -t tone-tpu-serve .
# Run:    docker run --privileged -p 8080:8080 -p 8002:8002 tone-tpu-serve

FROM python:3.11-slim AS build

RUN pip install --no-cache-dir build

# LICENSE is read at wheel-build time (pyproject `license = {file = ...}`).
COPY pyproject.toml README.md LICENSE /workspace/
COPY tone_tpu /workspace/tone_tpu

WORKDIR /workspace
RUN python -m build --wheel

# Model artifacts are fetched at build time so the image is self-contained
# (reference Dockerfile does the same with `python -m tone download`).
# jax[tpu] pulls libtpu; the build stage only needs CPU jax for the download.
RUN pip install --no-cache-dir dist/*.whl jax huggingface_hub
# /models must exist even when the download fails (no network at build
# time): the second stage COPYs it, and the compose file can volume-mount
# real artifacts over the empty directory.
RUN mkdir -p /models \
    && { tone-tpu download /models \
         || echo "WARNING: artifact download failed (no network?); mount /models"; }

FROM python:3.11-slim

COPY --from=build /workspace/dist /tmp/dist
COPY --from=build /models /models

RUN pip install --no-cache-dir /tmp/dist/*.whl "jax[tpu]" websockets \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && rm -rf /tmp/dist ~/.cache

# Load from the baked (or volume-mounted) folder instead of HF Hub
# (reference Dockerfile's LOAD_FROM_FOLDER).
ENV TONE_TPU_MODEL_DIR=/models

# Persistent XLA compile cache: restarts skip the jit/warmup compiles
# (mount a volume over /cache to keep it across container replacements —
# the TensorRT-engine-reuse equivalent).
ENV TONE_TPU_COMPILE_CACHE=/cache/xla
RUN mkdir -p /cache/xla && chmod 777 /cache/xla

RUN useradd -s /bin/bash python
USER python

STOPSIGNAL SIGINT

# 8080: websocket /api/ws (reference demo protocol)
# 8002: Prometheus /metrics + /healthz + /v2/health/ready (Triton parity)
ENTRYPOINT ["tone-tpu", "serve", "--checkpoint", "/models", \
            "--host", "0.0.0.0", "--port", "8080", "--metrics-port", "8002"]
