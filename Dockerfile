# Serving image for the TPU-native recommendation API.
# Deployment shape mirrors the reference (/root/reference/Dockerfile): slim
# multi-stage build, non-root user, /health HEALTHCHECK, graceful shutdown.
# On TPU nodes, base this on a libtpu-enabled image instead and the same
# entrypoint works unchanged (JAX picks up the TPU runtime).

FROM python:3.12-slim AS base

# ITOR_AOT_DIR: default zero-compile startup — the deploy pipeline bakes
# serialized serve executables next to the model volume with
#   python -m instacart_next_order_recommendation_tpu.serve.precompile \
#       --config configs/inference.yaml --export-aot /models/aot
# (device-specific; run it on the serving hardware class). An absent or
# mismatched store is a clean miss, so the env is safe to set always.
ENV PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1 \
    ITOR_COMPILATION_CACHE=/app/.cache/itor_xla \
    ITOR_AOT_DIR=/models/aot

WORKDIR /app

# CPU JAX by default; swap for jax[tpu] on TPU nodes.
RUN pip install --no-cache-dir \
    "jax>=0.4.30" "flax>=0.8" "optax>=0.2" \
    numpy pandas pyyaml pydantic prometheus-client httpx datasets scipy

COPY instacart_next_order_recommendation_tpu/ instacart_next_order_recommendation_tpu/
COPY configs/ configs/
COPY scripts/ scripts/

RUN useradd --create-home appuser \
    && mkdir -p /app/data /app/.cache \
    && chown -R appuser:appuser /app
USER appuser

EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s --start-period=120s --retries=3 \
    CMD python -c "import httpx; r = httpx.get('http://localhost:8000/health', timeout=3); exit(0 if r.status_code == 200 else 1)"

# MODEL_DIR / CORPUS_PATH are provided via env (k8s ConfigMap).
CMD ["python", "-m", "instacart_next_order_recommendation_tpu.api", "--host", "0.0.0.0", "--port", "8000"]
