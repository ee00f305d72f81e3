"""Training CLI + background-training orchestration.

Behaviour contract with the reference ``train.py`` (SURVEY.md §2.11):
the app training recipe (broadened annotations, merged datasets, 80/20
split, the hardcoded app model config, TensorBoard server on
``training_log/``, model saved to ``models/<timestamp>``), training in a
spawned process that reports int-percentage progress over a one-way
queue (clamped to 99 while the process lives, forced to 100 once it
exits), and the same ``-d/--dataset`` CLI.

The engine underneath is the TPU-native trainer
(recognizer3d_tpu/training/trainer.py: one jit-compiled fwd/bwd/Adam
step over the device mesh).
"""

from __future__ import annotations

import queue as queue_mod
from datetime import datetime
from multiprocessing import get_context
from pathlib import Path
from typing import List, Optional

# The framework (and with it jax) is imported lazily inside the functions
# that need it: the CLI parent process only launches/polls the spawned
# worker, and keeping it import-light saves ~15 s of single-core startup
# that would otherwise be paid twice (the spawn child re-imports anyway).

CLASS_NAMES = ["background", "fingerpoint"]
MODELS_DIR = Path("models")
LOG_ROOT = Path("training_log")


def app_model_config(compute_dtype: str = "float32") -> RandLANetSettings:
    """The hardcoded production model config (reference train.py:50-51).

    ``compute_dtype`` is this framework's additive mixed-precision knob
    (models/settings.py): "bfloat16" trains with a bf16 activation chain
    and float32 master weights."""
    from recognizer3d_tpu import RandLANetSettings

    return RandLANetSettings(
        n_classes=2,
        n_features=0,
        knn="naive",
        n_points=2500,
        n_neighbors=32,
        decimation=4,
        compute_dtype=compute_dtype,
    )


def app_training_config() -> TrainingSettings:
    """The hardcoded app training recipe (reference train.py:54-59).

    ``device_pipeline`` is this framework's TPU-native execution mode: the
    training set lives in HBM and every epoch runs as ONE device program
    (on-device batch assembly + train steps under lax.scan) — same recipe
    contract (epochs/batch/lr/loss/augmentation), no per-step host work."""
    from recognizer3d_tpu import TrainingSettings

    return TrainingSettings(
        epochs=50,
        batch_size=4,
        learning_rate=1e-2,
        early_stopping=False,
        device_pipeline=True,
    )


class TrainingJob:
    """A training run in a spawned process, observable via ``poll()``.

    Progress flows one way: the child pushes int percentages into a
    queue; ``poll()`` drains it and reports the latest value, never
    showing 100 while the child is still alive (saving the model happens
    after the last epoch) and always 100 once it has exited.
    """

    def __init__(self, process=None, progress_queue=None):
        self._process = process
        self._queue = progress_queue
        self._latest = 1

    @classmethod
    def launch(
        cls, dataset_dirs: List[Path], compute_dtype: str = "float32"
    ) -> "TrainingJob":
        """Start training ``dataset_dirs`` in a fresh spawned process."""
        ctx = get_context("spawn")
        progress_queue = ctx.Queue()
        process = ctx.Process(
            target=run_training,
            args=(dataset_dirs, progress_queue, compute_dtype),
        )
        process.start()
        return cls(process, progress_queue)

    def poll(self) -> int:
        """Latest progress percentage in [1, 100]; 100 means finished."""
        if self._queue is not None:
            while True:
                try:
                    self._latest = self._queue.get_nowait()
                except queue_mod.Empty:
                    break
        if self._process is None or not self._process.is_alive():
            return 100
        return min(self._latest, 99)

    @property
    def succeeded(self):
        """None while running; afterwards whether the child exited cleanly.
        ``poll()`` keeps the reference's contract (100 = finished, however
        it finished — train.py:33-39); callers that must distinguish a
        crash from a completion check this instead."""
        if self._process is None:
            return True
        if self._process.is_alive():
            return None
        return self._process.exitcode == 0

    def kill(self) -> None:
        """Hard-stop the training process (app shutdown path)."""
        if self._process is not None and self._process.is_alive():
            self._process.kill()
            self._process.join()


def _start_tensorboard_server(logdir: Path):
    """Serve ``logdir`` like the reference app does (train.py:82-85);
    quietly skipped when tensorboard isn't available.

    Runs as a ``nice``-d subprocess rather than the reference's in-process
    thread: tensorboard's (TF) imports cost ~1-2 min of CPU that would
    otherwise contend with the trainer's compile-cache loads on a
    single-core host. Returns the Popen (or None) so the training worker
    can terminate it on exit, matching the reference thread's lifetime.
    """
    import importlib.util
    import os
    import subprocess
    import sys

    if importlib.util.find_spec("tensorboard") is None:
        return None

    def _demoted_child() -> None:
        os.nice(19)
        # die with the training worker even when it is SIGKILLed (the
        # app's Escape path) — otherwise tensorboard outlives it, holds
        # the port, and the next run's instance silently fails to bind
        try:
            import ctypes
            import signal

            PR_SET_PDEATHSIG = 1
            ctypes.CDLL("libc.so.6", use_errno=True).prctl(
                PR_SET_PDEATHSIG, signal.SIGTERM
            )
        except Exception:
            pass  # non-glibc platform: fall back to the finally-block kill

    try:
        return subprocess.Popen(
            [sys.executable, "-m", "tensorboard", "--logdir", str(logdir)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            preexec_fn=_demoted_child,
        )
    except Exception:
        return None


def run_training(
    dataset_dirs: List[Path],
    progress_queue=None,
    compute_dtype: str = "float32",
) -> Path:
    """The app training recipe; returns the saved model path."""
    from recognizer3d_tpu import (
        AugmentationSettings,
        Dataset,
        DatasetMerged,
        Model,
    )

    merged = DatasetMerged(
        [Dataset(d, broaden_annotations=True) for d in dataset_dirs]
    )
    train_split, val_split = merged.split()

    training = app_training_config()
    augmentation = AugmentationSettings(
        jitter_variance=0.01,
        jitter_limit=0.05,
        scale_limit=0.2,
        shift_limit=0.1,
        rotation_angle_variances=(0.06, 0.06, 0.06),
        rotation_angle_limits=(0.18, 0.18, 0.18),
    )

    run_name = Dataset.timestamp(datetime.now())
    log_dir = LOG_ROOT / run_name
    tb_server = _start_tensorboard_server(LOG_ROOT)
    print(f"\nStarting training and logging at {log_dir} ...")
    print(f"Training settings are: {training}")
    print(f"Augmentation settings are: {augmentation}\n")

    def report_progress(epoch: int, metrics) -> None:
        if progress_queue is not None:
            progress_queue.put(int(100 * epoch / training.epochs))

    try:
        model = Model(app_model_config(compute_dtype), use_gpu=True)
        model.train(
            train_split,
            val_split,
            training,
            augmentation,
            log_dir,
            CLASS_NAMES,
            callbacks=[report_progress],
        )

        model_path = MODELS_DIR / run_name
        model.save(model_path)
        print(f"\nModel saved to {model_path}")
        return model_path
    finally:
        if tb_server is not None:
            tb_server.terminate()


def _cli() -> None:
    from argparse import ArgumentParser
    from time import sleep, time

    parser = ArgumentParser(
        "Trainer",
        description="Use this script to train a model without the UI. This "
        "script also allows training on multiple datasets by "
        "combining them in one large dataset.",
        usage="python3 train.py -d data/dataset1 data/dataset2",
    )
    parser.add_argument(
        "-d",
        "--dataset",
        nargs="+",
        required=True,
        help="Select one or multiple datasets to train on. "
        "Paths should be relative to main project directory",
    )
    parser.add_argument(
        "--compute-dtype",
        choices=["float32", "bfloat16"],
        default="float32",
        help="Activation dtype for the model's dense/attention chain; "
        "bfloat16 trains mixed-precision with float32 master weights",
    )
    args = parser.parse_args()

    project_dir = Path(__file__).absolute().parent
    started = time()
    job = TrainingJob.launch(
        [project_dir / d for d in args.dataset], args.compute_dtype
    )
    while True:
        percent = job.poll()
        print(percent)
        if percent == 100:
            break
        sleep(1)
    if job.succeeded is False:
        print("training process crashed — see its output above")
        raise SystemExit(1)
    print(f"training took {(time() - started) / 60} minutes")


if __name__ == "__main__":
    _cli()
