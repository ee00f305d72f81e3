# ARM64 capture-edge image — the L7 packaging analogue of the reference's
# arm64.Dockerfile (/root/reference/arm64.Dockerfile: CUDA-on-ARM base +
# librealsense v2.50.0 built from source + sshd for headless access).
#
# Role in the TPU-native deployment: this image runs on the ARM machine the
# L515 is physically plugged into (there are no prebuilt pyrealsense2 wheels
# for arm64, so librealsense is compiled from source with its Python
# bindings). The capture host runs the interactive app / capture CLIs; model
# compute happens wherever JAX's default backend lives (the bundled CPU wheel
# on the edge box itself, or a TPU VM it ships datasets to — see Dockerfile
# for the TPU-host image).
#
# Build:  docker build -f arm64.Dockerfile -t recognizer3d-edge .
#         (on x86: docker buildx build --platform linux/arm64 ...)

FROM arm64v8/python:3.12-slim-bookworm

ARG DEBIAN_FRONTEND=noninteractive
ARG LIBREALSENSE_VERSION=2.50.0

# build deps for librealsense (USB + GL stacks) and our native KNN kernel
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake make git wget unzip \
        libssl-dev libusb-1.0-0-dev libudev-dev pkg-config \
        libgl1-mesa-dev libglu1-mesa-dev libx11-dev xorg-dev \
        python3-tk tk \
    && rm -rf /var/lib/apt/lists/*

# librealsense from source with Python bindings (the SDK publishes no arm64
# wheels; -DFORCE_RSUSB_BACKEND avoids the kernel-patch requirement on
# generic ARM boards)
RUN wget -q "https://github.com/IntelRealSense/librealsense/archive/refs/tags/v${LIBREALSENSE_VERSION}.zip" \
        -O /tmp/librealsense.zip \
    && unzip -q /tmp/librealsense.zip -d /tmp \
    && cmake -S "/tmp/librealsense-${LIBREALSENSE_VERSION}" -B /tmp/lrs-build \
        -DBUILD_PYTHON_BINDINGS:bool=true \
        -DBUILD_EXAMPLES=false \
        -DFORCE_RSUSB_BACKEND=true \
        -DCMAKE_BUILD_TYPE=Release \
    && cmake --build /tmp/lrs-build -j"$(nproc)" \
    && cmake --install /tmp/lrs-build \
    && rm -rf /tmp/librealsense.zip "/tmp/librealsense-${LIBREALSENSE_VERSION}" /tmp/lrs-build
ENV PYTHONPATH=/usr/local/lib

WORKDIR /opt/recognizer3d
COPY pyproject.toml README.md ./
COPY recognizer3d_tpu ./recognizer3d_tpu
COPY train.py predict.py main.py serve.py ./

# framework + UI extras (vispy/tk for the triptych app); jax's default CPU
# wheel ships for aarch64, so the full train/predict stack works on-edge
RUN pip install --no-cache-dir ".[ui]" \
    && make -C recognizer3d_tpu/native

ENTRYPOINT ["python"]
CMD ["main.py"]
