# TPU-serving image for the TIMED-Design UI (role of the reference's CUDA
# Dockerfile, Dockerfile:1-58 — retargeted at Cloud TPU VMs: no CUDA, the
# jax[tpu] wheel talks to the TPU driver via libtpu).
FROM python:3.12-slim

# toolchain layer first: source edits must not re-run apt
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY timed_design_tpu ./timed_design_tpu
# native components (C++ PDB scanner + parallel inflate pool) compile on
# first use; without a toolchain the pure-Python fallbacks take over.
# TD_NATIVE_DIR points the pip-installed package at these sources (its own
# relative lookup would land in site-packages, where they don't exist).
COPY native ./native
ENV TD_NATIVE_DIR=/app/native

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[ui,analysis]

EXPOSE 8501
# headless production serving instead of the UI:
#   CMD ["td-serve", "--model", "/models/TIMED.h5", "--host", "0.0.0.0", "--port", "8501"]
CMD ["streamlit", "run", "timed_design_tpu/ui.py", "--server.port=8501", \
     "--server.address=0.0.0.0", "--", "--path_to_models", "/models"]
