# Serving/eval container for dbtext-tpu — covers the reference's unchecked
# "Docker / docker-compose" TODO (reference README.md:107) with the
# TorchServe-equivalent stack (serve/server.py micro-batching REST server).
#
# CPU image by default (works anywhere; XLA CPU backend). For TPU serving,
# build on a TPU VM and swap the jax install for the TPU wheel — see
# requirements.txt.
FROM python:3.11-slim

# g++ for the lazily-built first-party geometry library
# (db_text_minimal_tpu/ops/geometry builds _libgeometry.so on first import).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt pillow

COPY db_text_minimal_tpu/ db_text_minimal_tpu/
COPY example_config.yaml .

# Pre-build the geometry shared library so first request isn't slowed by it.
RUN python -c "import db_text_minimal_tpu.ops.geometry"

# Mount trained checkpoints (or a StableHLO export) at /models.
VOLUME /models
EXPOSE 8080

# Same REST contract as the reference's TorchServe handler:
#   curl -X POST http://localhost:8080/predictions/dbtext -T img.jpg
ENTRYPOINT ["python", "-m", "db_text_minimal_tpu.serve.server", "--port", "8080"]
CMD ["--model_path", "/models/best_cp.ckpt"]
