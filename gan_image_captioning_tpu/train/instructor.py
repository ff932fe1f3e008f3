"""GANInstructor: the training engine.

Drives the reference's two-phase schedule (``training.py:15-235``) over the
fused jitted steps:

* MLE pre-training of the generator (``pretrain_generator``,
  ``training.py:99-126``): per-epoch train + val sweeps, best-val checkpoint
  ``pretrained_model.ckpt``.
* Adversarial training (``_run``/``adv_loop``, ``training.py:128-235``):
  alternating fused G/D updates, per-train-batch temperature ramp
  (``training.py:183``: ``i = adv_epoch + batch_frac``, ``N = adv_epochs``),
  best-val-g_loss checkpoint ``adv_model.ckpt``.

Intentional deviations from the reference (catalogued quirks, SURVEY §7):
temperature and step counters do NOT advance during validation sweeps (the
reference's ``adv_loop('val')`` advances both); ``disc_train_freq`` is
honored; optional BLEU-4/NLL_gen eval and full-state resume exist.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.loader import Batcher
from gan_image_captioning_tpu.ops.temperature import get_fixed_temperature
from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
from gan_image_captioning_tpu.train.state import create_train_state
from gan_image_captioning_tpu.train.steps import (
    make_adv_eval_step, make_adv_step, make_mle_eval_step, make_mle_step)
from gan_image_captioning_tpu.utils.logging import MetricWriter, create_logger


class GANInstructor:
    """Mirrors reference ``GANInstructor(args, train_dataset, dev_dataset)``
    (training.py:16-46)."""

    def __init__(self, config: Config, train_dataset, dev_dataset,
                 silent: bool = False):
        self.config = config
        self.train_dataset = train_dataset
        self.dev_dataset = dev_dataset

        self.save_dir = config.save_dir
        self.model_dir = config.model_dir
        os.makedirs(self.model_dir, exist_ok=True)

        self.log = create_logger(__name__, silent=silent, to_disk=True,
                                 log_file=config.log_file + ".txt")
        self.writer = MetricWriter(self.save_dir)

        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)

        from gan_image_captioning_tpu.ops import gumbel as gumbel_ops

        gumbel_ops.set_use_pallas(config.resolve_use_pallas())

        # State (params + 3 optimizers + counters + temperature + rng).
        rng = jax.random.PRNGKey(config.seed)
        self.state = create_train_state(config, rng)
        if config.resume:
            template = self.state
            self.state = ckpt_lib.load_state(config.resume, template)
            self.log.info("Resumed TrainState from %s (gen_steps=%d)"
                          % (config.resume, int(self.state.gen_steps)))
        elif config.init_gen_ckpt:
            # Warm-start the GENERATOR params only (optimizers/counters
            # fresh) — e.g. an imported pretrained GPT-2 decoder
            # (src/import_gpt2.py) before MLE/adversarial fine-tuning.
            gen_params = ckpt_lib.load_params(config.init_gen_ckpt,
                                              self.state.gen_params)
            self.state = self.state._replace(gen_params=gen_params)
            self.log.info("Initialized generator params from %s"
                          % config.init_gen_ckpt)

        # Device mesh (--mesh, e.g. "data:4,model:2"): shard the TrainState
        # per parallel/sharding.py's dp/tp rules and every batch over 'data';
        # the SAME jitted steps then run SPMD with XLA collectives.
        self.mesh = None
        from gan_image_captioning_tpu.kernels import decode_sample as dsk
        from gan_image_captioning_tpu.train import steps as steps_mod

        dsk.set_mesh(None)
        steps_mod.set_state_shardings(None)
        if config.mesh and config.decode_impl == "kernel":
            from gan_image_captioning_tpu.parallel.mesh import (
                make_mesh as _mk)

            probe = _mk(config.mesh)
            other = any(n not in ("data", "model") and s > 1
                        for n, s in probe.shape.items())
            mp = probe.shape.get("model", 1)
            if other or (mp > 1 and config.vocab_size % mp != 0):
                # PP/SP axes shard the stack/sequence dims the kernel holds
                # whole — fall back to the mathematically identical
                # decoupled implementation, which GSPMD shards.
                config = config.replace(decode_impl="decoupled")
                self.config = config
                self.log.info("--mesh with pp/sp axes (or vocab %% model "
                              "!= 0): decode-impl kernel → decoupled")
            elif mp > 1:
                # data×model mesh: vocab-parallel decode
                # (kernels/decode_sample._decode_sample_tp — per-step
                # argmax-of-partials combine over the model axis)
                dsk.set_mesh(probe)
                self.log.info("--mesh data×model: decode kernel runs "
                              "vocab-parallel (TP) via shard_map")
            else:
                # data-only mesh: the decode + disc-conv kernels run
                # per-shard via shard_map (kernels/decode_sample.set_mesh)
                dsk.set_mesh(probe)
                self.log.info("--mesh data-only: decode kernel runs "
                              "per-shard via shard_map")
        if config.mesh:
            from gan_image_captioning_tpu.parallel.mesh import make_mesh
            from gan_image_captioning_tpu.parallel.sharding import (
                shard_train_state)

            self.mesh = make_mesh(config.mesh)
            zero1 = bool(config.zero1
                         and self.mesh.shape.get("data", 1) > 1)
            self.state = shard_train_state(self.state, self.mesh,
                                           zero1=zero1)
            self.log.info("Sharded over mesh %s" % dict(self.mesh.shape))
            if zero1:
                # Pin every train step's output layout so the sharded
                # moments stay sharded and the params stay replicated
                # (parallel/sharding.py ZeRO-1 notes).
                from gan_image_captioning_tpu.parallel.sharding import (
                    train_state_shardings)

                steps_mod.set_state_shardings(
                    train_state_shardings(self.state, self.mesh, zero1=True))
                self.log.info("ZeRO-1: Adam moments sharded over data:%d"
                              % self.mesh.shape["data"])

            # sp axis → sequence parallelism inside the jitted steps:
            # GSPMD activation sharding by default; --cp-mode ring|ulysses
            # swaps the self-attention for the explicit shard_map kernels.
            from gan_image_captioning_tpu.models import transformer as tf_lib

            if "sp" in self.mesh.shape:
                from jax.sharding import NamedSharding, PartitionSpec as P

                data_ax = "data" if "data" in self.mesh.shape else None
                tf_lib.set_activation_sharding(
                    NamedSharding(self.mesh, P(data_ax, "sp", None)))
                if config.cp_mode in ("ring", "ulysses"):
                    tf_lib.set_context_parallel(config.cp_mode, self.mesh)
                self.log.info("Sequence parallelism on sp:%d (%s)"
                              % (self.mesh.shape["sp"], config.cp_mode))
            # pp axis → GPipe microbatch pipeline over the block stacks in
            # the teacher-forced passes (parallel/pipeline.py).
            if "pp" in self.mesh.shape:
                tf_lib.set_pipeline(
                    self.mesh, num_microbatches=config.pp_microbatches)
                self.log.info("Pipeline parallelism on pp:%d (%d microbatches)"
                              % (self.mesh.shape["pp"],
                                 config.pp_microbatches))

        # Jitted steps.
        self.mle_step = make_mle_step(config)
        self.mle_eval_step = make_mle_eval_step(config)
        self.adv_step = make_adv_step(config)
        self.adv_eval_step = make_adv_eval_step(config)

        # --steps-per-call K > 1: K train steps fused into ONE device
        # program (lax.scan over stacked batches, train/steps.py:
        # make_multi_step) — amortizes the per-dispatch host RTT that caps
        # in-run throughput on remote/tunneled chips (NEXT_STEPS r3 item 5).
        self.steps_per_call = max(1, int(config.steps_per_call))
        if self.steps_per_call > 1:
            from gan_image_captioning_tpu.train.steps import make_multi_step

            self.mle_multi = make_multi_step(config, "mle")
            self.adv_multi = make_multi_step(config, "adv")

        if (config.cache_features and config.cgan
                and not config.trainable_backbone
                and config.gen_arch == "lstm"):
            from gan_image_captioning_tpu.data.feature_cache import (
                CachedFeatureDataset, precompute_backbone_features)

            if config.random_flip or config.random_crop_pad:
                self.log.warning(
                    "--cache-features precomputes backbone features from "
                    "UNaugmented images; --random-flip/--random-crop-pad "
                    "will have no effect on this run")
            self.log.info("Caching frozen-backbone features "
                          "(one pass per image)…")
            for name in ("train_dataset", "dev_dataset"):
                base = getattr(self, name)
                feats = precompute_backbone_features(
                    base, self.state.gen_params["encoder"], config)
                setattr(self, name, CachedFeatureDataset(base, feats))
            train_dataset = self.train_dataset
            dev_dataset = self.dev_dataset

        # Loaders (reference training.py:28-32; fixed shapes + threads here).
        seq = config.seq_len
        nw = config.num_workers
        buckets = ([int(b) for b in config.length_buckets.split(",") if b]
                   or None)
        # multi-host: each process loads its disjoint slice of the epoch
        # (DP feeding, SURVEY §2.3); single process → no sharding.
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        pc = config.precollate
        self.pre_train_loader = Batcher(
            train_dataset, config.pre_train_batch_size, seq, shuffle=True,
            seed=config.seed, drop_last=True, num_workers=nw,
            bucket_bounds=buckets, host_shard=shard, precollate=pc)
        self.pre_eval_loader = Batcher(
            dev_dataset, config.pre_eval_batch_size, seq, shuffle=False,
            num_workers=nw, bucket_bounds=buckets, host_shard=shard,
            precollate=pc)
        self.adv_train_loader = Batcher(
            train_dataset, config.adv_train_batch_size, seq, shuffle=True,
            seed=config.seed + 1, drop_last=True, num_workers=nw,
            bucket_bounds=buckets, host_shard=shard, precollate=pc)
        self.adv_eval_loader = Batcher(
            dev_dataset, config.adv_eval_batch_size, seq, shuffle=False,
            num_workers=nw, bucket_bounds=buckets, host_shard=shard,
            precollate=pc)

        self.pretrain_steps = 0
        self.adv_batch_steps = 0
        self._ss_prob = 0.0   # scheduled-sampling feedback prob (per-epoch)
        self._scst_step = 0

        # Per-phase best-val tracking as STATE (not loop locals) so an
        # interrupt save records it and a resumed run continues the
        # best-checkpoint selection + --early-stop-patience counters
        # instead of resetting them (train/schedule.py).
        self._best = {"pretrain": {"loss": None, "since": 0, "total": 0.0},
                      "scst": {"reward": None},
                      "adv": {"loss": None, "since": 0}}

        # Schedule fast-forward (--resume with a sidecar): restore the
        # host-side schedule position the TrainState cannot carry — phase/
        # epoch/batch, loader shuffle-epoch counters, step mirrors, best-val
        # trackers.  Loaders exist by now, so counters can be set directly.
        self._schedule = None
        if config.resume and config.resume_schedule:
            from gan_image_captioning_tpu.train import schedule as sched_lib

            self._schedule = sched_lib.load_sidecar(config.resume)
        if self._schedule:
            s = self._schedule
            for name, ep in s.get("loader_epochs", {}).items():
                loader = getattr(self, name + "_loader", None)
                if loader is not None:
                    loader.epoch = int(ep)
            self.pretrain_steps = int(s.get("pretrain_steps", 0))
            self.adv_batch_steps = int(s.get("adv_batch_steps", 0))
            self._scst_step = int(s.get("scst_step", 0))
            for phase, vals in (s.get("best") or {}).items():
                if phase in self._best:
                    self._best[phase].update(vals)
            self.log.info(
                "Schedule sidecar: fast-forwarding to %s epoch %d, batch %d"
                % (s["phase"], int(s.get("epoch", 0)),
                   int(s.get("batches_done", 0))))

        # Graceful interruption (SIGTERM/SIGINT → full-state checkpoint):
        # a crash in the reference loses everything except the last best-val
        # state_dict (SURVEY §5 "failure detection"); here preemption saves
        # a resumable TrainState at the next epoch boundary.
        self._interrupted = False
        self._interrupt_saved = False
        self._sweep_break = None
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    signal.signal(sig, lambda *_: self._request_interrupt())
                except (ValueError, OSError):
                    pass

    def _request_interrupt(self):
        self._interrupted = True

    def _schedule_info(self, phase: str, epoch: int,
                       batches_done: int = 0) -> dict:
        """Host-side schedule position for a sidecar (train/schedule.py).

        ``batches_done > 0`` means the save happens MID-train-sweep: the
        in-progress train loader already incremented its shuffle-epoch
        counter when the sweep started, so the recorded value rewinds by
        one — the resumed iteration then replays the identical seeded
        order and skips the applied batches.
        """
        loader_epochs = {
            name: getattr(self, name + "_loader").epoch
            for name in ("pre_train", "pre_eval", "adv_train", "adv_eval")}
        if batches_done > 0:
            mid = {"pretrain": "pre_train", "scst": "pre_train",
                   "adv": "adv_train"}[phase]
            loader_epochs[mid] -= 1
        train_loader = {"pretrain": self.pre_train_loader,
                        "scst": self.pre_train_loader,
                        "adv": self.adv_train_loader}[phase]
        return {"phase": phase, "epoch": int(epoch),
                "batches_done": int(batches_done),
                "num_train_batches": len(train_loader),
                "pretrain_steps": int(self.pretrain_steps),
                "adv_batch_steps": int(self.adv_batch_steps),
                "scst_step": int(self._scst_step),
                "loader_epochs": loader_epochs,
                "best": self._best}

    def _phase_resume_point(self, phase: str, train_loader) -> tuple:
        """``(start_epoch, start_batch)`` for ``phase``, guarding a
        mid-sweep resume against changed loader geometry: if the epoch no
        longer has the batch count the sidecar was written under (batch
        size / dataset / bucket flags changed), skipping ``batches_done``
        batches would land on the WRONG data — degrade to the next epoch
        boundary (never double-train the applied batches)."""
        from gan_image_captioning_tpu.train import schedule as sched_lib

        epoch, batch = sched_lib.phase_start(self._schedule, phase)
        if batch > 0:
            n = (self._schedule or {}).get("num_train_batches")
            if n is not None and int(n) != len(train_loader):
                self.log.warning(
                    "schedule sidecar recorded %s train batches/epoch but "
                    "the loader now yields %d — resuming at the next epoch "
                    "boundary (%d) instead of mid-sweep"
                    % (n, len(train_loader), epoch + 1))
                # the in-progress epoch's shuffle counter was rewound for a
                # replay that now won't happen — re-advance past it
                train_loader.epoch += 1
                return epoch + 1, 0
        return epoch, batch

    def _save_resumable(self, path: str, phase: str, epoch: int,
                        batches_done: int = 0, sync: bool = False):
        """Full TrainState + schedule sidecar — everything ``--resume``
        needs to continue exactly here."""
        from gan_image_captioning_tpu.train import schedule as sched_lib

        ckpt_lib.save_state(path, self.state, sync=sync)
        sched_lib.save_sidecar(
            path, self._schedule_info(phase, epoch, batches_done))

    def _save_interrupt(self, phase: str, epoch: int, batches_done: int = 0):
        path = os.path.join(self.model_dir, "interrupt_state.ckpt")
        # sync: the process is about to exit — the save must hit disk now
        self._save_resumable(path, phase, epoch, batches_done, sync=True)
        self._interrupt_saved = True
        self.log.info(
            "Interrupted — resumable TrainState saved to %s at %s epoch %d "
            "batch %d (restart with --resume %s; the schedule fast-forwards "
            "from the sidecar)" % (path, phase, epoch, batches_done, path))

    def _checkpoint_if_interrupted(self, phase: str = "pretrain",
                                   epoch: int = 0) -> bool:
        if not self._interrupted:
            return False
        self._save_interrupt(phase, epoch)
        return True

    # ----------------------------------------------------------- MLE phase

    def _device_batch(self, batch):
        """Shard a host batch over the mesh's data axis (no-op un-meshed)."""
        if self.mesh is None:
            return batch
        from gan_image_captioning_tpu.parallel.sharding import shard_batch

        return shard_batch(batch, self.mesh)

    def _device_batches(self, loader):
        """Device-resident batch stream: host batches are uploaded on a
        background thread ``--device-prefetch`` deep, so batch N+1's
        host→device transfer overlaps batch N's step (data/loader.py
        ``device_prefetch``; the reference blocks on ``.to(device)`` per
        batch, training.py:59,139)."""
        from gan_image_captioning_tpu.data.loader import device_prefetch

        if self.mesh is not None:
            from gan_image_captioning_tpu.parallel.sharding import shard_batch

            mesh = self.mesh
            put = lambda b: shard_batch(b, mesh)  # noqa: E731
        else:
            put = jax.device_put
        return device_prefetch(iter(loader), put,
                               self.config.device_prefetch)

    def _device_groups(self, it):
        """Device-resident ``(stacked_batch, count)`` stream for
        ``--steps-per-call`` (data/loader.py:stack_batches): K host batches
        stack into one ``[K, ...]`` upload feeding K scanned train steps;
        the upload itself still overlaps compute via ``device_prefetch``."""
        from gan_image_captioning_tpu.data.loader import (device_prefetch,
                                                          stack_batches)

        if self.mesh is not None:
            from gan_image_captioning_tpu.parallel.sharding import shard_batch

            mesh = self.mesh
            put_one = lambda b: shard_batch(b, mesh, step_axis=True)  # noqa: E731
        else:
            put_one = jax.device_put
        put = lambda item: (put_one(item[0]), item[1])  # noqa: E731
        return device_prefetch(stack_batches(it, self.steps_per_call), put,
                               self.config.device_prefetch)

    def _progress(self, loader, what: str, total: Optional[int] = None):
        """tqdm batch bar (reference training.py:52,133) when available and
        attached to a tty; otherwise the plain iterator."""
        try:
            import sys as _sys

            from tqdm import tqdm

            if _sys.stderr.isatty():
                if total is None:
                    total = len(loader)
                return tqdm(loader, total=total, desc=what, leave=False)
        except Exception:
            pass
        return loader

    def genpretrain_loop(self, what: str, start_batch: int = 0):
        """One sweep — reference ``genpretrain_loop`` (training.py:48-97).

        Metric fetches are DEFERRED to the sweep end AND batched into one
        ``jax.device_get``: a ``float(device_val)`` per step is a host
        sync that serializes dispatch, and even deferred per-scalar
        fetches pay one transfer RTT EACH (measured ~31 ms/scalar over
        the tunnel — 15.9 steps/s; ``device_get`` issues all the copies
        async and blocks once — 104.8 steps/s on the same loop).

        Train sweeps check the interrupt flag PER BATCH: a SIGTERM breaks
        out after the in-flight step and sets ``self._sweep_break`` to the
        batches-done count so the caller saves a mid-epoch resumable
        checkpoint (the round-2 behavior finished the whole epoch first —
        longer than a preemption grace window at full-COCO scale).
        ``start_batch`` resumes a sweep at that batch with the identical
        shuffle order (``Batcher.iter_from``)."""
        loader = self.pre_train_loader if what == "train" else self.pre_eval_loader
        ss_prob = np.float32(self._ss_prob)  # scheduled-sampling feedback p
        pending = []               # (loss[K], gnorm[K]|None, tag, step0, K)
        self._sweep_break = None
        it = (loader.iter_from(start_batch) if what == "train"
              else iter(loader))
        if what == "train" and self.steps_per_call > 1:
            k, done = self.steps_per_call, 0
            tag = "GenPreTraining_train_loss"
            for stacked, count in self._progress(
                    self._device_groups(it), f"pretrain/{what}",
                    total=-(-(len(loader) - start_batch) // k)):
                scalars = np.full((count,), ss_prob, np.float32)
                self.state, metrics = self.mle_multi(self.state, stacked,
                                                     scalars)
                pending.append((metrics["gen_pretrain_loss"],
                                metrics.get("gen_grad_norm"), tag,
                                self.pretrain_steps + 1, count))
                self.pretrain_steps += count
                done += count
                if self._interrupted:
                    # interrupt granularity = one K-step group
                    self._sweep_break = start_batch + done
                    break
        else:
            for off, batch in enumerate(self._progress(
                    self._device_batches(it), f"pretrain/{what}",
                    total=len(loader) - start_batch)):
                if what == "train":
                    self.state, metrics = self.mle_step(self.state, batch,
                                                        ss_prob)
                    self.pretrain_steps += 1
                    tag = "GenPreTraining_train_loss"
                else:
                    self.state, metrics = self.mle_eval_step(self.state,
                                                             batch, ss_prob)
                    tag = "GenPreTraining_val_loss"
                pending.append((metrics["gen_pretrain_loss"],
                                metrics.get("gen_grad_norm"), tag,
                                self.pretrain_steps, 1))
                if what == "train" and self._interrupted:
                    self._sweep_break = start_batch + off + 1
                    break
        fetched = jax.device_get([(dev, gn) for dev, gn, _, _, _ in pending])
        losses = []
        for (loss, gnorm), (_, _, tag, step0, count) in zip(fetched, pending):
            la = np.ravel(np.asarray(loss))
            ga = None if gnorm is None else np.ravel(np.asarray(gnorm))
            for j in range(count):
                v = float(la[j])
                losses.append(v)
                self.writer.add_scalar(tag, v, step0 + j)
                if ga is not None:
                    # pre-clip generator grad norm (train/steps.py) — the
                    # instability signal the loss curves only show after
                    self.writer.add_scalar("GenPreTraining_grad_norm",
                                           float(ga[j]), step0 + j)
        return losses

    def pretrain_generator(self, epochs: int):
        """Reference ``pretrain_generator`` (training.py:99-126)."""
        from gan_image_captioning_tpu.train import schedule as sched_lib

        if sched_lib.phase_completed(self._schedule, "pretrain"):
            return 0.0  # resumed past this phase (train/schedule.py)
        start_epoch, start_batch = self._phase_resume_point(
            "pretrain", self.pre_train_loader)
        self.log.info("Pretraining Generator")
        best = self._best["pretrain"]
        for epoch in range(start_epoch, epochs):
            if self._checkpoint_if_interrupted("pretrain", epoch):
                return best["total"] / epochs if epochs else 0
            if self.config.mle_objective == "scheduled":
                # linear per-epoch ramp 0 → ss_max_prob (Bengio et al. 2015)
                self._ss_prob = (self.config.ss_max_prob
                                 * epoch / max(1, epochs - 1))
            sb = start_batch if epoch == start_epoch else 0
            train_epoch_loss = float(np.mean(
                self.genpretrain_loop("train", start_batch=sb) or [0]))
            if self._sweep_break is not None:
                self._save_interrupt("pretrain", epoch, self._sweep_break)
                return best["total"] / epochs if epochs else 0
            best["total"] += train_epoch_loss
            val_epoch_loss = float(np.mean(self.genpretrain_loop("val") or [0]))

            if best["loss"] is None or val_epoch_loss < best["loss"]:
                best["loss"] = val_epoch_loss
                best["since"] = 0
                ckpt_lib.save_params(
                    os.path.join(self.model_dir, "pretrained_model.ckpt"),
                    self.state.gen_params)
                if self.state.ema_gen_params is not None:
                    ckpt_lib.save_params(
                        os.path.join(self.model_dir,
                                     "pretrained_model_ema.ckpt"),
                        self.state.ema_gen_params)
                self.log.info("Saving Best model [Gen Loss = {}] at Epoch {}"
                              .format(best["loss"], epoch))
            else:
                best["since"] += 1
            if (self.config.checkpoint_every
                    and epoch % self.config.checkpoint_every == 0):
                # periodic full-state snapshots during PRETRAIN too (the
                # adv loop has had them since round 2) + retention; the
                # sidecar makes --resume continue at the NEXT epoch
                self._save_resumable(
                    os.path.join(self.model_dir,
                                 f"state_pre_{epoch}.ckpt"),
                    "pretrain", epoch + 1)
                ckpt_lib.prune_checkpoints(self.model_dir, "state_pre_",
                                           self.config.keep_checkpoints)
            if epoch % self.config.pre_log_step == 0:
                self.log.info("Epoch {}: \n \t Train: {} \n\t Val: {} "
                              .format(epoch, train_epoch_loss, val_epoch_loss))
            if (self.config.early_stop_patience
                    and best["since"] >= self.config.early_stop_patience):
                self.log.info(
                    "Early stop: pretrain val loss has not improved for %d "
                    "epochs (best %.6f)" % (best["since"], best["loss"]))
                break
        return best["total"] / epochs if epochs != 0 else 0

    # ---------------------------------------------------- adversarial phase

    def _temperature(self, adv_epoch: int, batch_frac: float) -> float:
        """Reference ramp (training.py:183,190-191): fractional-epoch
        progress over N = adv_epochs."""
        return get_fixed_temperature(
            self.config.temperature, adv_epoch + batch_frac,
            self.config.adv_epochs, self.config.temp_adpt)

    def adv_loop(self, what: str, adv_epoch: int, start_batch: int = 0):
        """One sweep — reference ``adv_loop`` (training.py:128-188).

        Train sweeps honor per-batch interrupts and ``start_batch`` resume
        exactly like :meth:`genpretrain_loop`; the temperature ramp uses the
        GLOBAL batch index, so a resumed epoch continues the reference's
        fractional-epoch schedule (training.py:183) bit-exactly."""
        loader = self.adv_train_loader if what == "train" else self.adv_eval_loader
        num_batches = max(len(loader), 1)
        temp = float(self.state.temperature) or 1.0
        # host-mirrored step counter: int(state.gen_steps) per batch would
        # be a per-step device sync (see genpretrain_loop docstring)
        step_counter = int(self.state.gen_steps)
        pending = []         # (g[K], d[K], gn[K]|None, dn[K]|None, tags,
        #                       step0, K)
        t_sweep = time.time()
        self._sweep_break = None
        it = (loader.iter_from(start_batch) if what == "train"
              else iter(loader))
        if what == "train" and self.steps_per_call > 1:
            k, done = self.steps_per_call, 0
            g_tag, d_tag = "Generator_train_loss", "Discriminator_train_loss"
            for stacked, count in self._progress(
                    self._device_groups(it), f"adv/{what}",
                    total=-(-(len(loader) - start_batch) // k)):
                base = start_batch + done
                # per-inner-step temperatures — the identical per-batch
                # fractional-epoch ramp (training.py:183)
                temps = np.asarray(
                    [self._temperature(adv_epoch, (base + j + 1) / num_batches)
                     for j in range(count)], np.float32)
                self.state, metrics = self.adv_multi(self.state, stacked,
                                                     temps)
                self.adv_batch_steps += count
                pending.append((metrics["gen_adv_loss"],
                                metrics["disc_adv_loss"],
                                metrics.get("gen_grad_norm"),
                                metrics.get("disc_grad_norm"),
                                (g_tag, d_tag), step_counter + 1, count))
                step_counter += count
                done += count
                if self._interrupted:
                    self._sweep_break = start_batch + done
                    break
        else:
            for off, batch in enumerate(
                    self._progress(self._device_batches(it), f"adv/{what}",
                                   total=len(loader) - start_batch)):
                batch_idx = start_batch + off
                if what == "train":
                    temp = self._temperature(adv_epoch,
                                             (batch_idx + 1) / num_batches)
                    self.state, metrics = self.adv_step(self.state, batch,
                                                        temp)
                    self.adv_batch_steps += 1
                    step_counter += 1
                    d_tag, g_tag = ("Discriminator_train_loss",
                                    "Generator_train_loss")
                else:
                    self.state, metrics = self.adv_eval_step(self.state,
                                                             batch, temp)
                    d_tag, g_tag = ("Discriminator_val_loss",
                                    "Generator_val_loss")
                pending.append((metrics["gen_adv_loss"],
                                metrics["disc_adv_loss"],
                                metrics.get("gen_grad_norm"),
                                metrics.get("disc_grad_norm"),
                                (g_tag, d_tag), step_counter, 1))
                if what == "train" and self._interrupted:
                    self._sweep_break = batch_idx + 1
                    break
        # one batched fetch for the whole sweep (see genpretrain_loop)
        fetched = jax.device_get(
            [(g, d, gn, dn) for g, d, gn, dn, _, _, _ in pending])
        g_losses, d_losses = [], []
        for (g_loss, d_loss, g_norm, d_norm), \
                (_, _, _, _, (g_tag, d_tag), step0, count) \
                in zip(fetched, pending):
            ga, da = np.ravel(np.asarray(g_loss)), np.ravel(np.asarray(d_loss))
            gna = None if g_norm is None else np.ravel(np.asarray(g_norm))
            dna = None if d_norm is None else np.ravel(np.asarray(d_norm))
            for j in range(count):
                g_losses.append(float(ga[j]))
                d_losses.append(float(da[j]))
                self.writer.add_scalar(d_tag, float(da[j]), step0 + j)
                self.writer.add_scalar(g_tag, float(ga[j]), step0 + j)
                if gna is not None:
                    self.writer.add_scalar("Generator_grad_norm",
                                           float(gna[j]), step0 + j)
                    self.writer.add_scalar("Discriminator_grad_norm",
                                           float(dna[j]), step0 + j)
        if what == "train" and g_losses:
            rate = len(g_losses) / max(time.time() - t_sweep, 1e-9)
            self.writer.add_scalar("adv_steps_per_sec", rate, step_counter)
        return float(np.mean(g_losses or [0])), float(np.mean(d_losses or [0]))

    def evaluate_quality(self, max_batches: Optional[int] = None):
        """NLL_gen + BLEU-4 on the dev set (the report's metrics, first-class
        instead of the reference's commented-out calls, training.py:75-76)."""
        from gan_image_captioning_tpu.eval.metrics import bleu4_from_batches
        from gan_image_captioning_tpu.models import api

        config = self.config

        if not hasattr(self, "_greedy_decode"):
            def _decode(gen_params, batch):
                cond, _ = api.generator_condition(config, gen_params, batch,
                                                  train=False)
                if config.beam_size > 1:
                    from gan_image_captioning_tpu.eval import decode as dlib

                    ids, _ = dlib.beam_search(gen_params, cond["features"],
                                              config,
                                              beam_size=config.beam_size,
                                              context=cond["context"],
                                              length_penalty=config
                                              .length_penalty)
                    return ids
                ak = int(os.environ.get("GIC_EVAL_ADAPTIVE", "0"))
                if ak > 0:
                    # early-stopping in-run eval decode: the BLEU probe's
                    # cost drops to ceil(longest-caption/ak) blocks
                    # (captions strip at <E> before scoring either way)
                    from gan_image_captioning_tpu.eval import decode as dlib

                    ids, _ = dlib.greedy_with_logprobs_adaptive(
                        gen_params, cond["features"], config,
                        context=cond["context"], chunk=ak,
                        allow_kernel=self.mesh is None)
                    return ids
                _, ids = api.generator_sample(gen_params, cond,
                                              jax.random.PRNGKey(0), 1.0,
                                              config.seq_len, True, config)
                return ids
            self._greedy_decode = (jax.jit(_decode) if not config.no_jit
                                   else _decode)

        nll_dev, gen_dev, real_batches, weight_batches = [], [], [], []
        for i, batch in enumerate(self.pre_eval_loader):
            if max_batches is not None and i >= max_batches:
                break
            batch_dev = self._device_batch(batch)
            self.state, metrics = self.mle_eval_step(self.state, batch_dev)
            nll_dev.append(metrics["gen_pretrain_loss"])
            gen_dev.append(self._greedy_decode(self.state.gen_params,
                                               batch_dev))
            real_batches.append(batch["captions"])
            weight_batches.append(batch.get("weights"))
        # one batched fetch at the end — per-batch float()/asarray() host
        # syncs serialize dispatch, per-array fetches pay an RTT each
        # (see genpretrain_loop docstring)
        nll, gen_batches = jax.device_get((nll_dev, gen_dev))
        nll = [float(v) for v in nll]
        gen_batches = [np.asarray(ids) for ids in gen_batches]
        bleu4 = bleu4_from_batches(gen_batches, real_batches, weight_batches)

        # mode-collapse probe: self-BLEU of the generated corpus (1.0 =
        # every caption identical) — the failure mode adversarial training
        # actually exhibits (docs/results.md run 1: BLEU→0 with NLL spike)
        from gan_image_captioning_tpu.eval.diversity import self_bleu
        from gan_image_captioning_tpu.eval.metrics import strip_caption

        gen_caps = []
        for ids_b, w_b in zip(gen_batches, weight_batches):
            for j in range(ids_b.shape[0]):
                if w_b is not None and w_b[j] == 0:
                    continue
                gen_caps.append(strip_caption(ids_b[j]))
        sbleu = self_bleu(gen_caps)

        # qualitative sample: a couple of decoded captions into the log
        i2w = getattr(self.dev_dataset, "index_to_word", None)
        if i2w and gen_batches:
            from gan_image_captioning_tpu.eval.metrics import (ids_to_words,
                                                               strip_caption)

            for row, ref in list(zip(gen_batches[0], real_batches[0]))[:2]:
                self.log.info("[SAMPLE] gen: %s | ref: %s" % (
                    " ".join(ids_to_words(strip_caption(row), i2w)),
                    " ".join(ids_to_words(strip_caption(ref), i2w))))
        return {"nll_gen": float(np.mean(nll or [0])), "bleu4": bleu4,
                "self_bleu4": sbleu}

    def scst_finetune(self, epochs: int):
        """Self-critical sequence training (``--scst-epochs``): REINFORCE
        on a sentence metric reward, greedy-decode baseline
        (train/scst.py).  Runs between MLE pretraining and adversarial
        training; best-val-reward params land in ``scst_model.ckpt``."""
        if epochs <= 0:
            return
        from gan_image_captioning_tpu.train import schedule as sched_lib
        from gan_image_captioning_tpu.train import scst as scst_lib

        if sched_lib.phase_completed(self._schedule, "scst"):
            return  # resumed past this phase (train/schedule.py)
        start_epoch, start_batch = self._phase_resume_point(
            "scst", self.pre_train_loader)
        self.log.info("SCST finetuning (%d epochs, reward=%s)"
                      % (epochs, self.config.scst_reward))
        train_refs = val_refs = None
        if self.config.scst_multi_ref:
            train_refs = scst_lib.build_row_references(self.train_dataset,
                                                       True)
            val_refs = scst_lib.build_row_references(self.dev_dataset, True)
        reward_fn = scst_lib.build_reward_fn(self.config, self.train_dataset,
                                             row_refs=train_refs)
        rollout, update, greedy_only = scst_lib.make_scst_programs(
            self.config)
        base_key = jax.random.PRNGKey(self.config.seed + 31)
        best = self._best["scst"]
        # per-batch rng folds use the global SCST step — restored on resume
        # so a resumed run draws the identical sampling keys
        step = self._scst_step
        for epoch in range(start_epoch, epochs):
            if self._checkpoint_if_interrupted("scst", epoch):
                break
            t0 = time.time()
            advs, losses = [], []
            sb = start_batch if epoch == start_epoch else 0
            interrupted_at = None
            for off, batch in enumerate(self._progress(
                    self._device_batches(self.pre_train_loader.iter_from(sb)),
                    f"scst/{epoch}", total=len(self.pre_train_loader) - sb)):
                k1, k2 = jax.random.split(jax.random.fold_in(base_key, step))
                sampled, greedy = rollout(self.state.gen_params, batch, k1)
                sampled, greedy, refs, w, bidx = jax.device_get(
                    (sampled, greedy, batch["captions"], batch["weights"],
                     batch.get("index")))
                adv = scst_lib.batch_advantage(reward_fn, sampled, greedy,
                                               refs, row_refs=train_refs,
                                               index=bidx)
                adv *= w  # pad rows (zero weight) contribute no gradient
                self.state, loss = update(self.state, batch,
                                          jax.numpy.asarray(sampled),
                                          jax.numpy.asarray(adv), k2)
                advs.append(float(adv.mean()))
                losses.append(loss)
                step += 1
                self._scst_step = step
                if self._interrupted:
                    # per-batch save like the MLE/adv sweeps — an SCST
                    # epoch (rollout + reward) is the most expensive kind
                    interrupted_at = sb + off + 1
                    break
            if interrupted_at is not None:
                self._save_interrupt("scst", epoch, interrupted_at)
                break
            # val sweep: mean greedy reward (the quantity SCST maximizes);
            # greedy-only program, pad rows excluded from the mean
            val_sum, val_n = 0.0, 0
            for batch in self._device_batches(self.pre_eval_loader):
                greedy = greedy_only(self.state.gen_params, batch)
                greedy, refs, w, bidx = jax.device_get(
                    (greedy, batch["captions"], batch["weights"],
                     batch.get("index")))
                s, c = scst_lib.batch_reward(reward_fn, greedy, refs,
                                             row_refs=val_refs, index=bidx,
                                             weights=w)
                val_sum += s
                val_n += c
            val_r = val_sum / max(val_n, 1)
            train_loss = float(np.mean(jax.device_get(losses))) \
                if losses else 0.0
            self.writer.add_scalar("SCST_val_reward", val_r, step)
            self.writer.add_scalar("SCST_train_loss", train_loss, step)
            if best["reward"] is None or val_r > best["reward"]:
                best["reward"] = val_r
                ckpt_lib.save_params(
                    os.path.join(self.model_dir, "scst_model.ckpt"),
                    self.state.gen_params)
                self.log.info("Saving Best SCST model [val %s = %.4f] "
                              "at Epoch %d" % (self.config.scst_reward,
                                               best["reward"], epoch))
            self.log.info(
                "[SCST] epoch %d: val %s %.4f | mean advantage %.4f | "
                "loss %.5f  [%.1fs]" % (
                    epoch, self.config.scst_reward, val_r,
                    float(np.mean(advs or [0])), train_loss,
                    time.time() - t0))

    def _run(self):
        """The full schedule — reference ``_run`` (training.py:201-235).

        An interrupted run resumes seamlessly: ``--resume
        <ckpt>`` with a schedule sidecar skips the completed phases and
        epochs and re-enters a broken train sweep at the exact batch
        (train/schedule.py; the sidecar is written by interrupt saves and
        ``--checkpoint-every`` snapshots)."""
        self.pretrain_generator(self.config.pretrain_epochs)
        if self._interrupted:
            if not self._interrupt_saved:
                # signal landed during the phase's final val sweep — save
                # at the NEXT phase's start so no progress is lost
                self._save_interrupt(
                    "scst" if self.config.scst_epochs > 0 else "adv", 0)
            ckpt_lib.wait_for_checkpoints()
            return

        self.scst_finetune(self.config.scst_epochs)
        if self._interrupted:
            if not self._interrupt_saved:
                self._save_interrupt("adv", 0)
            ckpt_lib.wait_for_checkpoints()
            return

        start_epoch, start_batch = self._phase_resume_point(
            "adv", self.adv_train_loader)
        self.log.info("Starting Adversarial Training...")
        best = self._best["adv"]
        for adv_epoch in range(start_epoch, self.config.adv_epochs):
            if self._checkpoint_if_interrupted("adv", adv_epoch):
                break
            t_start = time.time()
            if self.config.profile_dir and adv_epoch == 0:
                # Trace the first adversarial epoch (jax.profiler → Perfetto/
                # TensorBoard); the reference has no profiling at all.
                jax.profiler.start_trace(self.config.profile_dir)
            sb = start_batch if adv_epoch == start_epoch else 0
            train_g_loss, train_d_loss = self.adv_loop("train", adv_epoch,
                                                       start_batch=sb)
            if self._sweep_break is not None:
                if self.config.profile_dir and adv_epoch == 0:
                    jax.profiler.stop_trace()
                self._save_interrupt("adv", adv_epoch, self._sweep_break)
                break
            if self.config.profile_dir and adv_epoch == 0:
                jax.profiler.stop_trace()
            val_g_loss, val_d_loss = self.adv_loop("val", adv_epoch)

            if best["loss"] is None or val_g_loss < best["loss"]:
                best["loss"] = val_g_loss
                best["since"] = 0
                ckpt_lib.save_params(
                    os.path.join(self.model_dir, "adv_model.ckpt"),
                    {"generator": self.state.gen_params,
                     "discriminator": self.state.disc_params})
                if self.state.ema_gen_params is not None:
                    ckpt_lib.save_params(
                        os.path.join(self.model_dir, "adv_model_ema.ckpt"),
                        self.state.ema_gen_params)
                self.log.info("Saving Best model [Gen Loss = {}] at Epoch {}"
                              .format(best["loss"], adv_epoch))
            else:
                best["since"] += 1

            if (self.config.checkpoint_every
                    and adv_epoch % self.config.checkpoint_every == 0):
                self._save_resumable(
                    os.path.join(self.model_dir, f"state_{adv_epoch}.ckpt"),
                    "adv", adv_epoch + 1)
                ckpt_lib.prune_checkpoints(self.model_dir, "state_",
                                           self.config.keep_checkpoints)

            if (adv_epoch % self.config.adv_log_step == 0
                    or adv_epoch == self.config.adv_epochs - 1):
                self.log.info(
                    "[ADV] epoch %d (temperature: %.4f):\n\t g_loss: %.4f | %.4f "
                    "\n\t d_loss: %.4f | %.4f  [%.1fs]" % (
                        adv_epoch, float(self.state.temperature),
                        train_g_loss, val_g_loss, train_d_loss, val_d_loss,
                        time.time() - t_start))

            if (self.config.eval_bleu_every
                    and adv_epoch % self.config.eval_bleu_every == 0):
                q = self.evaluate_quality()
                self.writer.add_scalar("NLL_gen", q["nll_gen"],
                                       int(self.state.gen_steps))
                self.writer.add_scalar("BLEU4", q["bleu4"],
                                       int(self.state.gen_steps))
                self.writer.add_scalar("SelfBLEU4", q["self_bleu4"],
                                       int(self.state.gen_steps))
                self.log.info("[EVAL] NLL_gen %.4f | BLEU-4 %.5f | "
                              "self-BLEU %.4f"
                              % (q["nll_gen"], q["bleu4"], q["self_bleu4"]))

            if (self.config.early_stop_patience
                    and best["since"] >= self.config.early_stop_patience):
                self.log.info(
                    "Early stop: adversarial val g_loss has not improved "
                    "for %d epochs (best %.6f)" % (best["since"],
                                                   best["loss"]))
                break

        if self._interrupted and not self._interrupt_saved:
            # signal landed in an adv val sweep (or after the final epoch):
            # resume at the next epoch — the completed train sweeps are kept
            self._save_interrupt("adv", adv_epoch + 1
                                 if self.config.adv_epochs > start_epoch
                                 else start_epoch)
        # barrier: all async checkpoint writes must be committed before the
        # run is reported complete
        ckpt_lib.wait_for_checkpoints()
