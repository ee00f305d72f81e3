"""Training engine.

Protocol parity with the reference Trainer
(``/root/reference/randlanet/utils/trainer.py``):

- Adam (b1=0.9, b2=0.999, eps=1e-8) with the StepLR schedule
  lr = lr0 · decay^((epoch−1)//10) (trainer.py:77-83);
- per-epoch: train over all batches → scheduler step → 10-seed validation →
  early-stopping check on ``val_mIoU`` → console + TensorBoard logging →
  callbacks (trainer.py:103-158);
- evaluation averages over n_evaluations=10 runs with fixed seeds 100·i,
  saving/restoring the global numpy RNG state (trainer.py:301-312) — the
  seeds drive the per-forward point permutation, exactly the reference's
  stochasticity;
- optional postprocess evaluation upsamples predictions onto the raw cloud
  (batch_size 1) and scores against full-resolution labels
  (trainer.py:305-343).

TPU-native execution: the whole optimisation step — forward (train-mode BN +
dropout), loss, backward, Adam update, batch metrics — is ONE donated jitted
program; the host only feeds numpy batches and drains metric scalars once
per epoch. With ``TrainingSettings.data_parallel_devices > 1`` the same step
is sharded batch-wise over a ``jax.sharding.Mesh`` (gradients/batch-stats
all-reduce via XLA collectives — see recognizer3d_tpu/parallel).
"""

import logging
import math
import time
from collections import OrderedDict
from functools import partial
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recognizer3d_tpu.training.early_stopper import EarlyStopper
from recognizer3d_tpu.training.losses import get_loss
from recognizer3d_tpu.training.metrics import (
    MetricCollector,
    MetricCollectorBag,
    accuracy_array,
    iou_array,
)
from recognizer3d_tpu.training.settings import TrainingSettings
from recognizer3d_tpu.utils.host_rng import host_threefry_keys
from recognizer3d_tpu.utils.tb import make_summary_writer

logger = logging.getLogger("trainer")
logger.setLevel(logging.DEBUG)


def _metrics_arrays(logits, labels):
    oa, pca = accuracy_array(logits, labels)
    miou, pciou = iou_array(logits, labels)
    return oa, pca, miou, pciou


class Trainer:
    def __init__(
        self,
        train_dataloader,
        validation_dataloader,
        log_dir: Optional[Path] = None,
        class_names: Optional[List[str]] = None,
    ):
        """Class managing the training process (trainer.py:42-60).

        :param train_dataloader: recognizer3d_tpu DataLoader for training data.
        :param validation_dataloader: DataLoader for validation data.
        :param log_dir: Optional directory path to store logging data.
        :param class_names: Optional list with class names (pretty logging).
        """
        self._train_dataloader = train_dataloader
        self._validation_dataloader = validation_dataloader
        self._log_dir = log_dir
        self._class_names = class_names

    # ------------------------------------------------------------------

    def train(
        self,
        model,
        settings: TrainingSettings,
        callbacks: List[Callable[[int, Dict[str, float]], None]] = [],
    ):
        """Train the given facade Model in place; returns it with the best
        (val_mIoU) weights loaded (trainer.py:62-168)."""
        from recognizer3d_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        module = model.module
        criterion = get_loss(settings.loss_function)
        variables = model.variables
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        tx = optax.scale_by_adam()  # torch-Adam semantics; lr applied manually
        opt_state = tx.init(params)

        mesh = None
        if settings.data_parallel_devices > 1:
            from recognizer3d_tpu.parallel.mesh import data_parallel_mesh

            # full batches must shard evenly over the mesh (the ragged-batch
            # guard in the epoch loop drops what cannot shard — if batch_size
            # itself were ragged, EVERY batch would be dropped and training
            # would silently do nothing). Clamp the mesh to the largest
            # divisor of batch_size we have devices for.
            n_dp = math.gcd(settings.data_parallel_devices, settings.batch_size)
            if n_dp != settings.data_parallel_devices:
                logger.warning(
                    f"batch_size {settings.batch_size} is not divisible by "
                    f"data_parallel_devices {settings.data_parallel_devices}; "
                    + (
                        f"using a {n_dp}-device data-parallel mesh instead."
                        if n_dp > 1
                        else "running without data-parallel sharding."
                    )
                )
            if n_dp > 1:
                mesh = data_parallel_mesh(n_dp)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(
            params, batch_stats, opt_state, inputs, labels, permutation,
            dropout_key, lr,
        ):
            def loss_fn(p):
                logits, updates = module.apply(
                    {"params": p, "batch_stats": batch_stats},
                    inputs,
                    permutation,
                    train=True,
                    rngs={"dropout": dropout_key},
                    mutable=["batch_stats"],
                )
                loss = criterion(logits, labels)
                return loss, (logits, updates["batch_stats"])

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state)
            new_params = optax.apply_updates(
                params, jax.tree.map(lambda u: -lr * u, updates)
            )
            return (new_params, new_bs, new_opt, loss) + _metrics_arrays(
                logits, labels
            )

        patience = (
            settings.early_stopping_patience
            if settings.early_stopping
            else settings.epochs
        )
        early_stopper = EarlyStopper(patience=patience, metric="val_mIoU")

        n_train = len(self._train_dataloader.dataset)
        n_val = len(self._validation_dataloader.dataset)
        logger.info(
            f"Training on {n_train} training samples and {n_val} "
            "validation samples."
        )
        writer = None
        if self._log_dir is not None:
            writer = make_summary_writer(str(self._log_dir))

        # ALL host-driven RNG (epoch shuffles, per-step PRNG keys, dropout
        # keys) is drawn from numpy: each jax.random utility call is a tiny
        # device program whose dispatch pays a full relay RTT on remote-TPU
        # setups — measured ~1,300 such calls (= minutes of wall clock) over
        # a 50-epoch run before this change. The uint32 pairs drawn here are
        # valid threefry keys consumed by jax.random inside the big jitted
        # programs; signatures (uint32[2]) match the old fold_in-produced
        # keys, so compile caches are unaffected.
        host_rng = np.random.RandomState(np.random.randint(0, 2**31 - 1))
        step_counter = 0
        shard_batch = (lambda x: x)
        if mesh is not None:
            from recognizer3d_tpu.parallel.mesh import shard_batch_fn

            shard_batch = shard_batch_fn(mesh)

        # optional device-resident input pipeline (data/pipeline.py): the
        # dataset lives in HBM, batches are subsampled+augmented on device
        device_cache = None
        if settings.device_pipeline:
            preproc = self._train_dataloader.dataset
            sample0 = preproc._dataset[0]
            if preproc._normalization is not None:
                # the device sampler has no normalization stage; silently
                # skipping it would train on un-normalized clouds while the
                # (host) validation loader normalizes
                logger.warning(
                    "device_pipeline requested but the loader uses "
                    f"normalization={preproc._normalization!r}; using the "
                    "host loader."
                )
            elif sample0[1].shape[1] == 0:  # xyz-only datasets
                from recognizer3d_tpu.data.pipeline import DeviceDatasetCache

                t_cache = time.monotonic()
                device_cache = DeviceDatasetCache(
                    preproc._dataset,
                    preproc._n_sample_points,
                    augmentation_settings=preproc._augmentation_settings,
                    mesh=mesh,
                )
                logger.info(
                    "device pipeline: dataset resident in HBM in "
                    f"{time.monotonic() - t_cache:.1f}s"
                )
            else:
                logger.warning(
                    "device_pipeline requested but the dataset has extra "
                    "point features; using the host loader."
                )
        def host_key(n: Optional[int] = None) -> np.ndarray:
            """(2,) or (n, 2) uint32 threefry key(s) from the host RNG."""
            return host_threefry_keys(host_rng, n)

        # with the device-resident pipeline the WHOLE epoch is one jitted
        # program: lax.scan over the shuffled full batches, each step doing
        # on-device batch assembly (subsample + augment) + forward + loss +
        # backward + Adam + metrics. The host dispatches once per epoch and
        # reads back only the per-step metric arrays. (The reference pays a
        # host round-trip per step — SURVEY.md §3.2 "HOT: CPU preproc".)
        #
        # Under a data-parallel mesh the same scan runs SPMD: each step's
        # sample ids arrive sharded over the "data" axis (the dataset tables
        # are replicated — pipeline.py), so batch assembly, forward, backward
        # and the gradient/BN psums all stay inside the one program; the
        # mesh size divides batch_size by construction (gcd clamp above).
        epoch_scan = None
        shard_ids = jnp.asarray
        if device_cache is not None:
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                ids_sharding = NamedSharding(
                    mesh, PartitionSpec(None, "data")
                )
                shard_ids = lambda ids: jax.device_put(ids, ids_sharding)
            sample_batch_fn = device_cache.sample_batch_fn
            n_pts_scan = device_cache.n_points

            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def epoch_scan(params, batch_stats, opt_state, sample_ids,
                           step_keys, lr):
                def body(carry, xs):
                    params, batch_stats, opt_state = carry
                    ids, step_key = xs
                    k_batch, k_perm, k_drop = jax.random.split(
                        step_key, 3
                    )
                    inputs, labels = sample_batch_fn(k_batch, ids)
                    permutation = jax.random.permutation(
                        k_perm, n_pts_scan
                    ).astype(jnp.int32)

                    def loss_fn(p):
                        logits, updates = module.apply(
                            {"params": p, "batch_stats": batch_stats},
                            inputs,
                            permutation,
                            train=True,
                            rngs={"dropout": k_drop},
                            mutable=["batch_stats"],
                        )
                        loss = criterion(logits, labels)
                        return loss, (logits, updates["batch_stats"])

                    (loss, (logits, new_bs)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params)
                    updates, new_opt = tx.update(grads, opt_state)
                    new_params = optax.apply_updates(
                        params, jax.tree.map(lambda u: -lr * u, updates)
                    )
                    return (
                        (new_params, new_bs, new_opt),
                        (loss,) + _metrics_arrays(logits, labels),
                    )

                (params, batch_stats, opt_state), metrics = jax.lax.scan(
                    body, (params, batch_stats, opt_state),
                    (sample_ids, step_keys),
                )
                return params, batch_stats, opt_state, metrics

        # checkpoint / resume (additive over the reference, SURVEY.md §5.4)
        ckpt_dir = None
        start_epoch = 1
        if self._log_dir is not None and (
            settings.checkpoint_every > 0 or settings.resume
        ):
            from recognizer3d_tpu.training import checkpoint as ckpt

            ckpt_dir = Path(self._log_dir) / "checkpoints"
            if settings.resume:
                latest = ckpt.latest_checkpoint(ckpt_dir)
                if latest is not None:
                    from flax import serialization as flax_serialization

                    restored = ckpt.restore_checkpoint(ckpt_dir, latest)
                    params = flax_serialization.from_state_dict(
                        params, restored["params"]
                    )
                    batch_stats = flax_serialization.from_state_dict(
                        batch_stats, restored["batch_stats"]
                    )
                    opt_state = flax_serialization.from_state_dict(
                        opt_state, restored["opt_state"]
                    )
                    start_epoch = int(restored["epoch"]) + 1
                    step_counter = int(restored.get("step", 0))
                    logger.info(
                        f"Resumed from checkpoint epoch {latest} in {ckpt_dir}"
                    )

        for epoch in range(start_epoch, settings.epochs + 1):
            t_epoch = time.monotonic()
            # StepLR: lr0 · decay^((epoch−1)//10) — trainer.py:81-83
            lr = settings.learning_rate * (
                settings.learning_rate_decay ** ((epoch - 1) // 10)
            )
            train_metrics = MetricCollector(self._class_names)
            pending = []
            scanned = None
            if epoch_scan is not None:
                order = host_rng.permutation(device_cache.n_samples).astype(
                    np.int32
                )
                bs = settings.batch_size
                n_steps = len(order) // bs
                if n_steps:
                    ids = shard_ids(
                        order[: n_steps * bs].reshape(n_steps, bs)
                    )
                    step_keys = host_key(n_steps)
                    params, batch_stats, opt_state, scanned = epoch_scan(
                        params, batch_stats, opt_state, ids, step_keys,
                        np.float32(lr),
                    )
                    step_counter += n_steps
                # the ragged remainder batch runs through the per-batch step
                # (same coverage as the host loader's final partial batch);
                # under a DP mesh it could not shard — dropped (DDP-style)
                batch_iter = []
                n_rem = len(order) - n_steps * bs
                if n_rem and mesh is None:
                    rem_ids = order[n_steps * bs :]
                    batch_iter = [
                        device_cache.sample_batch(host_key(), rem_ids)
                    ]
                elif n_rem:
                    logger.debug(
                        f"dropping ragged remainder of {n_rem} samples "
                        f"(mesh size {mesh.size})"
                    )
            elif device_cache is not None:
                batch_iter = device_cache.epoch_batches(
                    host_key(), settings.batch_size
                )
            else:
                batch_iter = (
                    (inputs, labels)
                    for inputs, labels, _ in self._train_dataloader
                )
            for inputs, labels in batch_iter:
                if mesh is not None and inputs.shape[0] % mesh.size:
                    # a ragged batch cannot shard over the DP mesh; drop it
                    # (the DP convention — torch DDP's drop_last) rather
                    # than recompile an unsharded step for one batch
                    logger.debug(
                        f"dropping ragged batch of {inputs.shape[0]} "
                        f"(mesh size {mesh.size})"
                    )
                    continue
                n_pts = inputs.shape[1]
                permutation = np.random.permutation(n_pts).astype(np.int32)
                dropout_key = host_key()
                step_counter += 1
                (
                    params, batch_stats, opt_state, loss, oa, pca, miou, pciou,
                ) = train_step(
                    params,
                    batch_stats,
                    opt_state,
                    shard_batch(inputs),
                    shard_batch(labels),
                    permutation,
                    dropout_key,
                    np.float32(lr),
                )
                pending.append((loss, oa, pca, miou, pciou))
            # one host sync per epoch
            if scanned is not None:
                for row in zip(*jax.device_get(scanned)):
                    train_metrics.push(*row)
            for loss, oa, pca, miou, pciou in jax.device_get(pending):
                train_metrics.push(loss, oa, pca, miou, pciou)

            t_train = time.monotonic()
            # evaluate on validation set (10 seeded runs, trainer.py:135-140)
            model.variables = {"params": params, "batch_stats": batch_stats}
            validation_metrics = Trainer.evaluate(
                model,
                self._validation_dataloader,
                class_names=self._class_names,
                loss_function=settings.loss_function,
            )
            t_done = time.monotonic()
            # first-epoch numbers ≈ compile / persistent-cache load cost;
            # later epochs are the steady-state recipe speed
            logger.info(
                f"epoch {epoch} timing: train {t_train - t_epoch:.1f}s, "
                f"validate {t_done - t_train:.1f}s"
            )
            metrics = train_metrics.as_dict()
            metrics.update(validation_metrics.as_dict("val"))
            continue_training = early_stopper.check(metrics, model.variables)
            self._log(
                epoch,
                settings.epochs,
                lr,
                train_metrics.as_dict(),
                validation_metrics.as_dict(include_stdev=True),
                writer,
            )
            for callback in callbacks:
                callback(epoch, metrics)
            if (
                ckpt_dir is not None
                and settings.checkpoint_every > 0
                and epoch % settings.checkpoint_every == 0
            ):
                from recognizer3d_tpu.training import checkpoint as ckpt

                ckpt.save_checkpoint(
                    ckpt_dir,
                    epoch,
                    {
                        "params": params,
                        "batch_stats": batch_stats,
                        "opt_state": opt_state,
                        "epoch": epoch,
                        "step": step_counter,
                    },
                )
            if not continue_training:
                break

        if writer is not None:
            writer.close()
        best = early_stopper.best_variables
        if best is None:
            logger.warning("Model did not improve during training!")
        else:
            model.variables = jax.device_put(best)
        return model

    # ------------------------------------------------------------------

    def _log(
        self,
        epoch: int,
        total_epochs: int,
        lr: float,
        train_metrics: OrderedDict,
        validation_metrics: OrderedDict,
        writer,
    ) -> None:
        """Console + TensorBoard logging (trainer.py:170-242)."""
        log_line = f"Epoch {epoch:3d}/{total_epochs:3d} - "
        for key in ["loss"]:
            log_line += "%s: %.4f - val_%s: %.4f (s: %.4f) - " % (
                key,
                train_metrics[key],
                key,
                validation_metrics[key][0],
                validation_metrics[key][1],
            )
        for key in ["mAcc", "mIoU"]:
            log_line += "%s: %.2f%% - val_%s: %.2f%% (s: %.2f%%) - " % (
                key,
                train_metrics[key] * 100,
                key,
                validation_metrics[key][0] * 100,
                validation_metrics[key][1] * 100,
            )
        logger.info(log_line[:-2])
        all_metrics = {
            "Training": train_metrics,
            "Validation": validation_metrics,
        }
        for mode, metrics in all_metrics.items():
            log_line = f"{'':15s} {mode + ' IoU:':16s}"
            keys = [k for k in metrics.keys() if k.endswith(" IoU")]
            for key in keys:
                log_line += key.split(" IoU")[0]
                metric = metrics[key]
                if isinstance(metric, tuple):
                    log_line += ": %5.2f%% (s: %5.2f%%)" % (
                        metric[0] * 100,
                        metric[1] * 100,
                    )
                elif isinstance(metric, float):
                    log_line += ": %5.2f%% %11s" % (metric * 100, "")
                if key != keys[-1]:
                    log_line += " - "
            logger.info(log_line)
        if writer is not None:
            writer.add_scalar("Learning rate", lr, epoch)
            tb_data: Dict[str, Dict] = {
                "Train": train_metrics,
                "Validation": validation_metrics,
            }
            for mode, metric_set in tb_data.items():
                for key, metric in metric_set.items():
                    writer.add_scalar(
                        f"{key}/{mode}",
                        metric[0] if isinstance(metric, tuple) else metric,
                        epoch,
                    )

    # ------------------------------------------------------------------

    @staticmethod
    def evaluate(
        model,
        data_loader,
        class_names: Optional[List[str]] = None,
        loss_function: str = "dice",
        postprocess: bool = False,
        n_evaluations: int = 10,
    ) -> MetricCollectorBag:
        """Seeded repeated evaluation (trainer.py:271-367).

        When the loader's data is seed-independent (consistent sampling, no
        augmentation, no shuffle — the reference's validation configuration,
        model.py:277-291) the whole sweep runs as ONE device program per
        batch-shape group (``lax.map`` over batches × seeds) with a single
        host readback, instead of n_seeds × n_batches synchronous dispatches.
        Numerically identical to the per-batch path: the per-(seed, batch)
        forward permutations are drawn from numpy in exactly the order the
        reference's loop draws them (trainer.py:301-312).
        """
        fast = (
            not postprocess
            and getattr(data_loader.dataset, "_cacheable", False)
            and not getattr(data_loader, "_shuffle", True)
        )
        if fast:
            return Trainer._evaluate_fused(
                model, data_loader, class_names, loss_function, n_evaluations
            )
        criterion = get_loss(loss_function)
        module = model.module

        cache = getattr(model, "_eval_step_cache", None)
        if cache is None:
            cache = {}
            model._eval_step_cache = cache
        eval_step = cache.get(loss_function)
        if eval_step is None:

            @jax.jit
            def eval_step(variables, inputs, labels, permutation):
                logits = module.apply(
                    variables, inputs, permutation, train=False
                )
                loss = criterion(logits, labels)
                return (loss,) + _metrics_arrays(logits, labels) + (logits,)

            cache[loss_function] = eval_step

        if postprocess:
            assert data_loader.batch_size == 1, (
                "Batch size 1 required when evaluating with postprocessing!"
            )

        seeds = [100 * i for i in range(n_evaluations)]
        rnd_state = np.random.get_state()
        variables = model.variables
        pending: List[List[tuple]] = []  # device tuples, one list per seed
        for seed in seeds:
            np.random.seed(seed)
            seed_pending = []
            for inputs, labels, indices in data_loader:
                n_pts = inputs.shape[1]
                permutation = np.random.permutation(n_pts).astype(np.int32)
                loss, oa, pca, miou, pciou, logits = eval_step(
                    variables, inputs, labels, permutation
                )
                if postprocess:
                    # upsample confidences onto the raw cloud and score
                    # against full-resolution labels (trainer.py:326-349)
                    raw_inputs, raw_labels, _ = data_loader.dataset.__getitem__(
                        int(indices[0]), preprocess=False
                    )
                    confidences = model.upsample(
                        logits, inputs[:, :, :3], raw_inputs[None, :, :3]
                    )
                    oa, pca = accuracy_array(
                        confidences[0], jnp.asarray(raw_labels)
                    )
                    miou, pciou = iou_array(
                        confidences[0], jnp.asarray(raw_labels)
                    )
                seed_pending.append((loss, oa, pca, miou, pciou))
            pending.append(seed_pending)
        np.random.set_state(rnd_state)
        # one host sync for the whole sweep (dispatches above are async)
        metric_collectors: List[MetricCollector] = []
        for seed_pending in jax.device_get(pending):
            evaluation_metrics = MetricCollector()
            for batch_metrics in seed_pending:
                evaluation_metrics.push(*batch_metrics)
            metric_collectors.append(evaluation_metrics)
        return MetricCollectorBag(metric_collectors, class_names)

    # ------------------------------------------------------------------

    @staticmethod
    def _evaluate_fused(
        model,
        data_loader,
        class_names: Optional[List[str]],
        loss_function: str,
        n_evaluations: int,
    ) -> MetricCollectorBag:
        """The seeded evaluation sweep as one device program per batch-shape
        group: ``lax.map`` over stacked batches, inner ``lax.map`` over the
        n_evaluations permutations, one ``device_get`` total.

        Valid only when batch data is identical across seeds (checked by the
        caller): consistent sampling seeds numpy to 0 and restores state
        (preprocessing.py:23-31 in the reference), so the seeded outer RNG
        only ever drives the per-forward permutations.
        """
        criterion = get_loss(loss_function)
        module = model.module
        variables = model.variables

        cache = getattr(model, "_eval_step_cache", None)
        if cache is None:
            cache = {}
            model._eval_step_cache = cache
        key = ("fused", loss_function)
        eval_sweep = cache.get(key)
        if eval_sweep is None:

            @jax.jit
            def eval_sweep(variables, inputs, labels, perms):
                def batch_fn(args):
                    inp, lab, ps = args

                    def seed_fn(p):
                        logits = module.apply(variables, inp, p, train=False)
                        loss = criterion(logits, lab)
                        return (loss,) + _metrics_arrays(logits, lab)

                    return jax.lax.map(seed_fn, ps)

                return jax.lax.map(batch_fn, (inputs, labels, perms))

            cache[key] = eval_sweep

        # the sweep's inputs (batches, permutations) are call-invariant for a
        # given loader — cache them ON DEVICE so the per-epoch validation in
        # the training loop skips the host pass and the re-upload entirely
        device_groups = getattr(data_loader, "_fused_eval_cache", {}).get(
            n_evaluations
        )
        if device_groups is None:
            # one host pass over the loader (the preprocessor caches
            # consistent samples, so this is the only full read)
            batches = [(inputs, labels) for inputs, labels, _ in data_loader]
            n_batches = len(batches)
            seeds = [100 * i for i in range(n_evaluations)]

            # per-(seed, batch) permutations, drawn in exactly the order the
            # per-batch loop draws them (trainer.py:301-312)
            rnd_state = np.random.get_state()
            perms = [[None] * n_evaluations for _ in range(n_batches)]
            for si, seed in enumerate(seeds):
                np.random.seed(seed)
                for bi, (inputs, _) in enumerate(batches):
                    perms[bi][si] = np.random.permutation(
                        inputs.shape[1]
                    ).astype(np.int32)
            np.random.set_state(rnd_state)

            # group batches by shape (a ragged final batch compiles apart)
            groups: Dict[tuple, List[int]] = {}
            for bi, (inputs, _) in enumerate(batches):
                groups.setdefault(inputs.shape, []).append(bi)
            device_groups = [
                (
                    batch_indices,
                    jax.device_put(
                        np.stack([batches[bi][0] for bi in batch_indices])
                    ),
                    jax.device_put(
                        np.stack([batches[bi][1] for bi in batch_indices])
                    ),
                    jax.device_put(
                        np.stack(
                            [np.stack(perms[bi]) for bi in batch_indices]
                        )
                    ),
                )
                for batch_indices in groups.values()
            ]
            if not hasattr(data_loader, "_fused_eval_cache"):
                data_loader._fused_eval_cache = {}
            data_loader._fused_eval_cache[n_evaluations] = device_groups
        n_batches = sum(len(g[0]) for g in device_groups)

        results = []  # (batch_indices, device result tuple) per group
        for batch_indices, inputs, labels, group_perms in device_groups:
            results.append(
                (
                    batch_indices,
                    eval_sweep(variables, inputs, labels, group_perms),
                )
            )

        # one readback for the whole sweep, then reassemble in the per-seed,
        # loader-order layout the MetricCollector protocol expects
        per_batch: Dict[int, tuple] = {}
        for batch_indices, result in results:
            host = jax.device_get(result)  # each array (n_group, n_seeds, ...)
            for gi, bi in enumerate(batch_indices):
                per_batch[bi] = tuple(arr[gi] for arr in host)
        metric_collectors = []
        for si in range(n_evaluations):
            evaluation_metrics = MetricCollector()
            for bi in range(n_batches):
                loss, oa, pca, miou, pciou = (
                    arr[si] for arr in per_batch[bi]
                )
                evaluation_metrics.push(loss, oa, pca, miou, pciou)
            metric_collectors.append(evaluation_metrics)
        return MetricCollectorBag(metric_collectors, class_names)
