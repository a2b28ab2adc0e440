"""Training orchestration: two-stage loop, checkpointing, resume.

Replaces the reference Lightning driver (/root/reference/src/train.py:18-230):
  * stage "vae": LA-VAE reconstruction training (bs 64, 3000 epochs),
  * stage "diffusion": denoiser training with the stage-1 VAE frozen,
    booted from PRETRAINED_VAE (train.py:181-193's key surgery becomes an
    orbax restore or a torch-ckpt conversion),
  * periodic keep-all checkpoints + newest-checkpoint resume
    (train.py:26-53,140-149),
  * per-epoch loss lines (ProgressLogger equivalent).

Text conditioning: frozen CLIP runs once per unique caption through a host
cache (the reference re-encodes every batch; captions repeat heavily, so
caching removes the text tower from the steady-state step entirely).
"""
from __future__ import annotations

import inspect
import logging
import queue
import signal
import threading
import time
from os.path import join as pjoin
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.data.datamodule import T2MDataModule
from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
from ladiff_tpu.training.trainer import (create_train_state,
                                         make_diffusion_train_step,
                                         make_optimizer, make_vae_train_step)
from ladiff_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint

__all__ = ["CaptionEmbedder", "HostPrefetcher", "PreemptionGuard",
           "run_training", "build_system"]


class HostPrefetcher:
    """Double-buffers the per-step host pipeline behind the device step.

    The reference hides input latency behind Lightning's NUM_WORKERS=8
    dataloader (/root/reference/src/configs/config_ladiff_humanml3d.yaml:34).
    Here ONE background thread is enough: it runs ``prepare`` (collate ->
    caption embedding -> host->device transfer) for batch N+1..N+depth
    while the device executes step N, so the step function never waits on
    host work in steady state.  JAX dispatch is thread-safe; the main
    thread keeps ownership of the training rng, so results are bit-identical
    with prefetching on or off.

    Exceptions in the producer surface in the consumer (re-raised from
    ``__next__``); ``close()`` stops the producer early (preemption /
    max-steps break) without deadlocking on a full queue.
    """

    _DONE = object()

    def __init__(self, iterator, prepare, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        # a prepare(item, stop_event) signature opts into checking the
        # stop event between its pipeline stages, so close() doesn't have
        # to wait out a whole collate+embed+transfer chain
        try:
            self._pass_stop = len(
                inspect.signature(prepare).parameters) >= 2
        except (TypeError, ValueError):
            self._pass_stop = False
        self._thread = threading.Thread(
            target=self._run, args=(iterator, prepare), daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, iterator, prepare):
        try:
            for item in iterator:
                if self._stop.is_set():
                    return
                out = (prepare(item, self._stop) if self._pass_stop
                       else prepare(item))
                # a stop-aware prepare may have bailed mid-pipeline
                if self._stop.is_set() or not self._put(out):
                    return
        except BaseException as e:  # surfaced in __next__
            self._exc = e
        finally:
            self._put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    # producer died without managing to enqueue the sentinel
                    item = self._DONE
                    break
        if item is self._DONE:
            self._thread.join()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def close(self):
        """Stop the producer and release queue slots; idempotent."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        if self._thread.is_alive():
            # still blocked inside prepare() (e.g. a slow host->device
            # transfer over the relay): it will exit at its next stop-event
            # check, but until then it is consuming the old iterator and
            # may touch shared caches — make that visible instead of silent
            logging.getLogger(__name__).warning(
                "HostPrefetcher.close(): producer thread still running "
                "after 5s join timeout (blocked inside prepare()); it will "
                "exit at the next stop check")


class PreemptionGuard:
    """Preemption-safe shutdown: SIGTERM/SIGINT set a flag the training loop
    polls between steps, triggering a checkpoint save + clean return.

    The reference has no preemption handling (SURVEY §5: resume-from-
    directory only); on TPU fleets preemption is routine, so the loop
    checkpoints before dying instead of losing up to
    SACE_CHECKPOINT_EPOCH (200) epochs.  Use as a context manager; the
    previous handlers are restored on exit.  A second signal falls through
    to the previous handler (so ctrl-C twice still kills).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.signals = signals
        self.triggered = False
        self._prev = {}

    def _handler(self, signum, frame):
        if self.triggered:  # second signal: escalate to the old handler
            prev = self._prev.get(signum)
            if callable(prev):
                prev(signum, frame)
            else:
                raise KeyboardInterrupt
        self.triggered = True

    def __enter__(self):
        for s in self.signals:
            self._prev[s] = signal.getsignal(s)
            try:
                signal.signal(s, self._handler)
            except ValueError:  # not the main thread — run unguarded
                self._prev.pop(s, None)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            # getsignal() returns None for handlers installed by non-Python
            # code; signal.signal(s, None) would raise, so fall back to the
            # default disposition
            signal.signal(s, signal.SIG_DFL if prev is None else prev)
        return False


class CaptionEmbedder:
    """caption string -> pooled CLIP features, cached on host."""

    def __init__(self, text_encoder):
        self.text_encoder = text_encoder
        self._cache: Dict[str, np.ndarray] = {}

    def __call__(self, texts) -> np.ndarray:
        missing = [t for t in texts if t not in self._cache]
        if missing:
            uniq = sorted(set(missing))
            embs = np.asarray(self.text_encoder(uniq))
            for t, e in zip(uniq, embs):
                self._cache[t] = e
        return np.stack([self._cache[t] for t in texts])

    @property
    def uncond(self) -> np.ndarray:
        return self([""])[0][None]  # [1, 1, 768]


def _ram_pct() -> Optional[float]:
    """Host RAM usage in percent, dependency-free (/proc/meminfo) — the
    per-epoch RAM readout of the reference's ProgressLogger
    (callback/progress.py:30-54, psutil there)."""
    try:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                info[k] = int(v.strip().split()[0])
        return 100.0 * (1.0 - info["MemAvailable"] / info["MemTotal"])
    except Exception:  # non-Linux host: skip the readout
        return None


def build_system(cfg, dm: T2MDataModule, dtype=None) -> LADiffSystem:
    """TRAIN.MIXED_PRECISION switches the compute dtype to bfloat16 while
    params/optimizer state stay float32 (losses reduce in f32 — see
    losses/mld.py) — the TPU-native speed knob the fp32-only reference
    lacks."""
    if dtype is None:
        dtype = (jnp.bfloat16
                 if bool(cfg.TRAIN.get("MIXED_PRECISION", False))
                 else jnp.float32)
    return LADiffSystem.from_cfg(cfg, nfeats=dm.nfeats, njoints=dm.njoints,
                                 mean=dm.mean, std=dm.std, dtype=dtype)


def _pad_batch(batch: dict, multiple: int) -> dict:
    """Pad the batch dim up to a multiple (repeat last rows) so it shards
    evenly; training loss weighting over duplicates is negligible for the
    final partial batch."""
    B = batch["motion"].shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            pad = np.repeat(v[-1:], rem, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        else:
            out[k] = list(v) + [v[-1]] * rem
    return out


def run_training(cfg, dm: T2MDataModule, logger,
                 text_encoder=None,
                 max_epochs: Optional[int] = None,
                 max_steps_per_epoch: Optional[int] = None) -> str:
    """Train the configured stage; returns the checkpoint directory."""
    stage = str(cfg.TRAIN.STAGE)
    system = build_system(cfg, dm)
    # TRAIN.TENSOR_PARALLEL > 1 folds that many devices into the mesh's
    # ``model`` axis (Megatron-style weight sharding, parallel/tp.py);
    # the default 1-wide model axis is plain data parallelism (the
    # reference's DDP equivalent)
    n_model = int(cfg.TRAIN.get("TENSOR_PARALLEL", 1) or 1)
    n_avail = jax.device_count()
    if n_model < 1 or n_avail % n_model != 0:
        # make_mesh would silently drop the remainder devices (or build an
        # empty mesh) — fail at the config line instead
        raise ValueError(
            f"TRAIN.TENSOR_PARALLEL={n_model} must divide the device count "
            f"({n_avail})")
    # TRAIN.FSDP=true shards the train state (params + AdamW moments)
    # over the DATA axis instead (ZeRO-3 layout, parallel/fsdp.py); XLA
    # gathers weights just-in-time and reduce-scatters gradients
    fsdp = bool(cfg.TRAIN.get("FSDP", False))
    # TRAIN.SEQUENCE_PARALLEL > 1 shards the VAE tower's TOKEN axis over
    # that many devices (parallel/sp.py wired for training — vae stage
    # only: the denoiser's 7 latent tokens have nothing to shard)
    n_seq = int(cfg.TRAIN.get("SEQUENCE_PARALLEL", 1) or 1)
    # TRAIN.PIPELINE_STAGES > 1 pipelines the denoiser's MD skip stack
    # over a GPipe schedule (parallel/pp.py — diffusion stage only);
    # TRAIN.PIPELINE_MICROBATCHES sets the microbatch count (default =
    # stages; bubble (S-1)/(n_micro+S-1))
    n_pipe = int(cfg.TRAIN.get("PIPELINE_STAGES", 1) or 1)
    for name, n in (("SEQUENCE_PARALLEL", n_seq),
                    ("PIPELINE_STAGES", n_pipe)):
        if n < 1:
            # same contract as the TENSOR_PARALLEL check above: a
            # nonsensical width fails at the config line instead of
            # silently training plain DP
            raise ValueError(f"TRAIN.{name}={n} must be >= 1")
    axes_on = [name for name, on in [
        ("TENSOR_PARALLEL", n_model > 1), ("FSDP", fsdp),
        ("SEQUENCE_PARALLEL", n_seq > 1), ("PIPELINE_STAGES", n_pipe > 1)]
        if on]
    if len(axes_on) > 1:
        raise ValueError(
            f"TRAIN.{' and TRAIN.'.join(axes_on)} are mutually exclusive "
            "(pick one non-DP parallelism layout)")
    if n_seq > 1:
        if stage != "vae":
            raise ValueError(
                "TRAIN.SEQUENCE_PARALLEL shards the VAE token axis; it is "
                f"supported for TRAIN.STAGE=vae only (got {stage!r})")
        if n_avail % n_seq != 0:
            raise ValueError(
                f"TRAIN.SEQUENCE_PARALLEL={n_seq} must divide the device "
                f"count ({n_avail})")
    if n_pipe > 1:
        if stage != "diffusion":
            raise ValueError(
                "TRAIN.PIPELINE_STAGES pipelines the denoiser MD stack; it "
                f"is supported for TRAIN.STAGE=diffusion only (got {stage!r})")
        if getattr(system, "ardiff", False) or not system.md_trans:
            raise ValueError(
                "TRAIN.PIPELINE_STAGES needs the MD_TRANS denoiser "
                "(non-AR): the pipeline program covers the MD skip stack")
        if n_pipe > n_avail:
            raise ValueError(
                f"TRAIN.PIPELINE_STAGES={n_pipe} exceeds the device count "
                f"({n_avail})")
    if n_pipe > 1:
        from ladiff_tpu.parallel.pp import make_pipe_mesh
        mesh = make_pipe_mesh(n_pipe)
        n_micro = int(cfg.TRAIN.get("PIPELINE_MICROBATCHES", n_pipe)
                      or n_pipe)
        pad_multiple = n_micro
    else:
        # a model axis of width n (TP weight-sharding) or n_seq (SP token
        # sharding — params replicated) — default 1-wide = plain DP
        mesh = make_mesh(n_model=n_seq if n_seq > 1 else n_model)
        pad_multiple = int(np.prod(mesh.devices.shape))
    exp_dir = cfg.get("FOLDER_EXP", ".")
    ckpt_dir = pjoin(exp_dir, "checkpoints")
    ckpt = CheckpointManager(ckpt_dir)

    # TRAIN.RNG_IMPL=rbg swaps the dropout/noise PRNG to the TPU-fast
    # counter-based generator: threefry bit generation alone is ~25% of the
    # VAE step (132 -> 99.5 ms/step measured; dropout in total, bits + mask
    # multiplies, is ~36% — see the breakdown table in PERF.md)
    _impls = {"threefry": "threefry2x32", "threefry2x32": "threefry2x32",
              "rbg": "rbg", "unsafe_rbg": "unsafe_rbg"}
    impl_key = str(cfg.TRAIN.get("RNG_IMPL", "threefry"))
    if impl_key not in _impls:
        raise ValueError(
            f"TRAIN.RNG_IMPL={impl_key!r} is not recognized; expected one "
            f"of {sorted(_impls)}")
    impl = _impls[impl_key]
    rng = jax.random.key(int(cfg.get("SEED_VALUE", 1234)), impl=impl)
    params = system.init_params(jax.random.PRNGKey(
        int(cfg.get("SEED_VALUE", 1234))))
    tx = make_optimizer(float(cfg.TRAIN.OPTIM.LR))

    is_action = system.condition == "action"
    if stage == "vae":
        state = create_train_state(params["vae"], tx)
        step_fn = make_vae_train_step(system, mesh, fsdp=fsdp,
                                      seq_parallel=n_seq > 1)
        embedder = None
    elif stage == "diffusion":
        # stage-1 boot: restore the pretrained VAE (reference train.py:181-193)
        vae_src = str(cfg.TRAIN.get("PRETRAINED_VAE", "") or "")
        vae_params = params["vae"]
        if vae_src:
            if vae_src.endswith(".ckpt"):
                from ladiff_tpu.utils.checkpoint import \
                    load_reference_vae_checkpoint
                vae_params = jax.tree.map(
                    jnp.asarray,
                    load_reference_vae_checkpoint(vae_src, system.num_layers))
                logger.info(f"loaded reference VAE ckpt from {vae_src}")
            else:
                found = latest_checkpoint(vae_src)
                if found is None:
                    raise FileNotFoundError(
                        f"PRETRAINED_VAE has no checkpoints: {vae_src}")
                _, tree = CheckpointManager(vae_src).restore(
                    found[0], {"params": {"vae": params["vae"]}, "epoch": 0})
                vae_params = tree["params"]["vae"]
                logger.info(f"loaded VAE epoch {found[0]} from {vae_src}")
        if is_action:
            # class-id conditioning: no text tower; the EmbedAction module
            # handles the CFG unconditional drop in-graph
            embedder = None
            uncond = np.zeros((1, 1, system.text_encoded_dim), np.float32)
        else:
            if text_encoder is None:
                from ladiff_tpu.models.clip_text import ClipTextEncoder
                text_encoder = ClipTextEncoder(
                    modelpath=str(cfg.model.get("clip_path", "") or "") or None)
            embedder = CaptionEmbedder(text_encoder)
            uncond = embedder.uncond
        state = create_train_state(params["denoiser"], tx)
        if n_pipe > 1:
            from ladiff_tpu.parallel.pp import make_pp_diffusion_train_step
            step_fn = make_pp_diffusion_train_step(system, mesh, vae_params,
                                                   uncond, n_micro=n_micro)
        else:
            step_fn = make_diffusion_train_step(system, mesh, vae_params,
                                                uncond, fsdp=fsdp)
    elif stage == "vae_diffusion":
        if text_encoder is None:
            from ladiff_tpu.models.clip_text import ClipTextEncoder
            text_encoder = ClipTextEncoder(
                modelpath=str(cfg.model.get("clip_path", "") or "") or None)
        embedder = CaptionEmbedder(text_encoder)
        from ladiff_tpu.training.trainer import make_vae_diffusion_train_step
        state = create_train_state(params, tx)
        step_fn = make_vae_diffusion_train_step(system, mesh, embedder.uncond,
                                                fsdp=fsdp)
    elif stage == "distill":
        # opt-in progressive distillation (training/distill.py, beyond the
        # reference): teacher = TRAIN.PRETRAINED stage-2 checkpoint (vae +
        # denoiser); student initialized FROM the teacher; student grid
        # size TRAIN.DISTILL_STEPS (default: half the configured inference
        # steps).  Guidance is folded into the student.
        if is_action:
            raise ValueError("TRAIN.STAGE=distill supports the text "
                             "condition only")
        teacher_src = str(cfg.TRAIN.get("PRETRAINED", "") or "")
        if not teacher_src:
            raise ValueError("TRAIN.STAGE=distill needs TRAIN.PRETRAINED "
                             "(the stage-2 teacher checkpoint)")
        if teacher_src.endswith(".ckpt"):
            from ladiff_tpu.utils.checkpoint import (
                load_reference_denoiser_checkpoint,
                load_reference_vae_checkpoint)
            vae_params = jax.tree.map(
                jnp.asarray,
                load_reference_vae_checkpoint(teacher_src,
                                              system.num_layers))
            teacher_den = jax.tree.map(
                jnp.asarray,
                load_reference_denoiser_checkpoint(
                    teacher_src, system.num_layers,
                    md_trans=system.md_trans))
            logger.info(f"loaded reference teacher ckpt from {teacher_src}")
        else:
            found = latest_checkpoint(teacher_src)
            if found is None:
                raise FileNotFoundError(
                    f"TRAIN.PRETRAINED has no checkpoints: {teacher_src}")
            _, tree = CheckpointManager(teacher_src).restore(
                found[0], {"params": params, "epoch": 0})
            vae_params = tree["params"]["vae"]
            teacher_den = tree["params"]["denoiser"]
            logger.info(f"loaded teacher epoch {found[0]} from {teacher_src}")
        if text_encoder is None:
            from ladiff_tpu.models.clip_text import ClipTextEncoder
            text_encoder = ClipTextEncoder(
                modelpath=str(cfg.model.get("clip_path", "") or "") or None)
        embedder = CaptionEmbedder(text_encoder)
        student_steps = int(cfg.TRAIN.get(
            "DISTILL_STEPS", max(1, system.num_inference_timesteps // 2)))
        state = create_train_state(teacher_den, tx)  # student := teacher
        from ladiff_tpu.training.distill import make_distill_train_step
        step_fn = make_distill_train_step(system, mesh, vae_params,
                                          teacher_den, embedder.uncond,
                                          student_steps, fsdp=fsdp)
    else:
        raise ValueError(f"unsupported stage {stage}")

    start_epoch = 0
    if str(cfg.TRAIN.get("RESUME", "") or ""):
        found = latest_checkpoint(ckpt_dir)
        if found:
            if stage == "vae":
                target = {"params": {"vae": params["vae"]}, "epoch": 0}
                start_epoch, tree = ckpt.restore(found[0], target)
                state = state.replace(params=tree["params"]["vae"])
            elif stage == "vae_diffusion":
                target = {"params": state.params, "epoch": 0}
                start_epoch, tree = ckpt.restore(found[0], target)
                state = state.replace(params=tree["params"])
            else:
                target = {"params": {"denoiser": state.params,
                                     "vae": vae_params}, "epoch": 0}
                start_epoch, tree = ckpt.restore(found[0], target)
                state = state.replace(params=tree["params"]["denoiser"])
                vae_params = tree["params"]["vae"]
            logger.info(f"resumed from epoch {start_epoch}")

    if n_model > 1:
        # lay the (possibly restored) state out with the TP weight specs;
        # the jitted step then inherits the shardings from its arguments
        from ladiff_tpu.parallel.tp import shard_train_state
        state = shard_train_state(state, mesh)
    elif fsdp:
        from ladiff_tpu.parallel.fsdp import shard_train_state
        state = shard_train_state(state, mesh)
    elif n_pipe > 1:
        # replicated state committed to the pipe mesh's device set (the
        # microbatch schedule, not the batch sharding, is the parallelism)
        from jax.sharding import NamedSharding, PartitionSpec
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    end_epoch = max_epochs if max_epochs is not None else int(cfg.TRAIN.END_EPOCH)
    save_every = int(cfg.LOGGER.get("SACE_CHECKPOINT_EPOCH", 200))
    bs = int(cfg.TRAIN.BATCH_SIZE)
    step_count = 0

    def save(epoch_mark: int) -> str:
        # diffusion-stage ckpts carry the frozen VAE too, mirroring the
        # reference stage-2 ckpt layout (LightningModule holds both)
        if stage == "vae":
            tree = {"params": {"vae": jax.device_get(state.params)},
                    "epoch": epoch_mark}
        elif stage == "vae_diffusion":
            tree = {"params": jax.device_get(state.params),
                    "epoch": epoch_mark}
        else:
            tree = {"params": {"denoiser": jax.device_get(state.params),
                               "vae": jax.device_get(vae_params)},
                    "epoch": epoch_mark}
        return ckpt.save(epoch_mark, tree)

    # scalar sinks: jsonl + TensorBoard + (when configured) WandB with
    # resume-run-id continuity (reference src/train.py:64-83)
    from ladiff_tpu.utils.logger import MetricsLogger
    metrics_sink = MetricsLogger.from_cfg(cfg)

    def prepare_batch(batch: dict, stop=None):
        """The per-step host pipeline: pad, assemble, embed captions,
        transfer host->device with the data sharding.  Runs on the
        prefetch thread (or inline when TRAIN.PREFETCH=0, stop=None).
        ``stop`` is the prefetcher's stop event, checked between stages so
        close() never waits out a whole embed+transfer chain."""
        batch = _pad_batch(batch, pad_multiple)
        device_batch = {
            "motion": np.ascontiguousarray(batch["motion"]),
            "length": np.ascontiguousarray(batch["length"]),
        }
        if stop is not None and stop.is_set():
            return None
        if stage in ("diffusion", "vae_diffusion", "distill"):
            if is_action:
                device_batch["action"] = np.ascontiguousarray(batch["action"])
            else:
                device_batch["text_emb"] = embedder(batch["text"])
        if stop is not None and stop.is_set():
            return None  # skip the (slow over the relay) device transfer
        if n_pipe > 1:
            # pipe mesh: the batch is replicated; the GPipe microbatch
            # schedule inside the step provides the parallelism
            from jax.sharding import NamedSharding, PartitionSpec
            return jax.device_put(device_batch,
                                  NamedSharding(mesh, PartitionSpec()))
        return shard_batch(device_batch, mesh)

    # TRAIN.PREFETCH: queue depth for the background host pipeline
    # (default 2 = double buffering; 0 = synchronous, for debugging)
    prefetch = int(cfg.TRAIN.get("PREFETCH", 2))

    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, end_epoch):
            t0 = time.time()
            losses = []
            buckets = cfg.TRAIN.get("LENGTH_BUCKETS", None)
            buckets = tuple(buckets) if buckets else None
            loader = dm.loader("train", batch_size=bs, seed=epoch,
                               buckets=buckets)
            if prefetch > 0:
                batches = HostPrefetcher(loader, prepare_batch,
                                         depth=prefetch)
            else:
                batches = map(prepare_batch, loader)
            try:
                for i, device_batch in enumerate(batches):
                    if max_steps_per_epoch and i >= max_steps_per_epoch:
                        break
                    if guard.triggered:
                        break
                    rng, step_rng = jax.random.split(rng)
                    state, logs = step_fn(state, device_batch, step_rng)
                    losses.append(logs)
                    step_count += 1
            finally:
                if isinstance(batches, HostPrefetcher):
                    batches.close()
            if guard.triggered:
                # partial epoch: mark the ckpt with the CURRENT epoch index
                # so resume reruns this epoch from its start
                path = save(epoch)
                logger.info(
                    f"preemption signal: saved {path} mid-epoch {epoch}, "
                    "exiting cleanly")
                metrics_sink.close()
                return ckpt_dir
            if losses:
                # ONE batched fetch for the whole epoch's scalars instead of
                # a device round trip per (step x key) — over the axon relay
                # each device_get costs a full round trip
                host_losses = jax.device_get(losses)
                mean_logs = {k: float(np.mean([l[k] for l in host_losses]))
                             for k in losses[0]}
                dt = time.time() - t0
                ram = _ram_pct()
                logger.info(
                    f"epoch {epoch} [{stage}] "
                    + " ".join(f"{k}={v:.5f}"
                               for k, v in sorted(mean_logs.items()))
                    + f" ({dt:.1f}s"
                    + (f", RAM {ram:.0f}%)" if ram is not None else ")"))
                metrics_sink.log(epoch, mean_logs, prefix=f"train/{stage}/")
            if (epoch + 1) % save_every == 0 or (epoch + 1) == end_epoch:
                path = save(epoch + 1)
                logger.info(f"saved checkpoint {path}")
    metrics_sink.close()
    return ckpt_dir
