"""Training configuration — parity with the reference's TrainingSettings
dataclass (``/root/reference/randlanet/utils/trainer.py:23-39``)."""

from dataclasses import dataclass


@dataclass
class TrainingSettings:
    #: Number of epochs to train
    epochs: int = 150
    #: Size of minibatches used during training
    batch_size: int = 8
    #: Base learning rate
    learning_rate: float = 1e-2
    #: Exponential decay for learning rate (applied every 10 epochs, like the
    #: reference's StepLR(step_size=10), trainer.py:81-83)
    learning_rate_decay: float = 0.9
    #: Loss function: "cross_entropy" | "focal" | "dice" | "tversky" | "focal_tversky"
    loss_function: str = "dice"
    #: Early stopping
    early_stopping: bool = True
    #: Patience for early stopping
    early_stopping_patience: int = 20
    #: Number of data-parallel devices to shard the batch over (1 = single
    #: chip; >1 uses a jax.sharding.Mesh over the batch axis — TPU-native
    #: replacement for the DDP the reference never had, SURVEY.md §2.9)
    data_parallel_devices: int = 1
    #: Save a full training-state checkpoint to <log_dir>/checkpoints every
    #: N epochs (0 disables — the reference's behaviour, which persists
    #: nothing mid-training, SURVEY.md §5.4)
    checkpoint_every: int = 0
    #: Resume from the latest checkpoint in <log_dir>/checkpoints if present
    resume: bool = False
    #: Keep the training set resident in device HBM and assemble batches
    #: (subsample + augment) on device — removes all per-step host
    #: preprocessing (data/pipeline.py). Falls back to the host loader for
    #: datasets with extra per-point features.
    device_pipeline: bool = False
