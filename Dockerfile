# TPU-host image for the recognizer3d_tpu framework — the L7 packaging
# equivalent of the reference's CUDA Dockerfile (/root/reference/Dockerfile:
# CUDA 11.3 base + librealsense built from source + torch/faiss). A TPU VM
# already ships the TPU driver, so the image only needs jax[tpu], the
# framework, and (optionally) the camera/UI extras for a capture host.

FROM python:3.12-slim

# native toolchain for the first-party C++ KD-tree KNN (ops/knn_cpp.py
# builds recognizer3d_tpu/native/libknn_kdtree.so via make at install time)
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/recognizer3d
COPY pyproject.toml README.md ./
COPY recognizer3d_tpu ./recognizer3d_tpu
COPY train.py predict.py main.py bench.py ./

# jax[tpu] resolves libtpu from the official releases index on a TPU VM;
# on a CPU-only host the same image runs with the default jax wheel.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

# build the native KNN kernel ahead of time (else it builds lazily on
# first kdtree use)
RUN make -C recognizer3d_tpu/native

# UI / camera extras are opt-in: they pull X11/vispy/librealsense and are
# only meaningful on the capture workstation, not the TPU trainer.
#   docker build --build-arg EXTRAS=ui,camera ...
ARG EXTRAS=""
RUN if [ -n "$EXTRAS" ]; then pip install --no-cache-dir ".[$EXTRAS]"; fi

ENTRYPOINT ["python"]
CMD ["main.py"]
