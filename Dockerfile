# TPU-native Learned Metric Index
# (cf. the reference's python:3.10-slim image, Dockerfile:1-31 — this one
# targets TPU VMs; for CPU-only testing the default jax wheel suffices)
FROM python:3.10-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY learnedmetricindex_tpu ./learnedmetricindex_tpu
COPY tests ./tests
COPY bench.py ./

# TPU VMs: replace with `pip install 'jax[tpu]' -f
# https://storage.googleapis.com/jax-releases/libtpu_releases.html`
RUN pip install --no-cache-dir -e ".[data,test]"

CMD ["python", "-m", "pytest", "tests/", "-q"]
