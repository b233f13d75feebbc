"""Training solver: epoch loop, curriculum, eval, best-model checkpoints.

Port of `lib/joint/solver_3dvlp.py` (Solver.__call__/_feed, :273-1245):

  * per epoch: dataset.shuffle_data() re-chunks sentences, train feed,
    val feed with grounding metrics, best-model selection keyed on
    2 x iou_rate_0.5 (criterion 'sum', solver:1114-1128);
  * curriculum handled inside the compiled loss (epoch-50 switches ride
    jnp.where) — the solver only passes the epoch scalar;
  * BN momentum schedule (detection/grounding runs) rebuilds the model
    def every bn_decay_step epochs (one recompile per 20 epochs);
  * checkpoints: model_last every epoch, epoch_50 at epoch 49,
    ground_model / ground_model_25 / ground_model_5 / model on val best,
    full train-state checkpoint every 10 epochs (solver:353-354, 1221-1245);
  * phase timers (fetch/forward/iter) + JSONL metric log (stands in for
    the tensorboardX/wandb writers, solver:218-228, 485-565).

One deliberate non-port: the reference switches its val feed to a
lang_num_max=1 "ground" loader at epoch 150 (solver_3dvlp.py:304-307).
Both of its loaders carry the same val sentences and eval_ground.py:184
already gates on j < lang_num, so the switch changes nothing about WHAT
is measured — it routes around the reference's own eval-val chunking bug
(train_3dvlp.py:332-334 appends a scene's chunk list into itself instead
of into the output). Our chunked val loader + lang_num-masked eval
computes the same per-sentence aggregate every epoch, so no switch
exists here.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from vlp3d.config import Config
from vlp3d.data.dataset import BatchIterator
from vlp3d.eval.grounding import final_eval_breakdown, get_eval
from vlp3d.models.jointnet import JointNet
from vlp3d.parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from vlp3d.train import checkpoint as ckpt
from vlp3d.train.optimizer import make_optimizer
from vlp3d.train.schedules import bn_momentum_torch, cosine_lr, step_lr
from vlp3d.train.state import TrainState, create_state, make_eval_step, make_train_step
from vlp3d.utils.timers import PhaseTimers, eta_str


class Solver:
    def __init__(
        self,
        config: Config,
        train_dataset,
        val_dataset,
        workdir: str,
        *,
        caption: bool = False,
        detection: bool = True,
        reference: bool = True,
        use_bn_schedule: bool = False,
        val_step: int = 1,
        log_every: int = 50,
        criterion: str = "sum",
        mesh=None,
        tp: int = 1,
        zero1: bool = False,
        grad_accum: int = 1,
        donate: bool = True,
        seed: int = 42,
        caption_eval_ctx: dict | None = None,
        use_wandb: bool = False,
        profile_dir: str | None = None,
        profile_steps: int = 3,
    ):
        """caption_eval_ctx (optional): {"corpus", "organized", "tokenizer"}
        — enables Scan2Cap metric evaluation during eval_epoch (the
        reference's Solver._eval -> eval_cap path, solver_3dvlp.py:720-765).
        """
        self.config = config
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.caption = caption
        self.detection = detection
        self.reference = reference
        self.use_bn_schedule = use_bn_schedule
        self.log_every = log_every
        # best-model criterion: 'sum' = 2 x iou_rate_0.5
        # (solver_3dvlp.py:1114-1128); a val-metric name (e.g. the VQA
        # path's 'answer_acc_at1', lib/vqa/solver.py:503-506) selects on
        # that metric; anything else leaves cur_best at 0 (:1129-1135)
        self.criterion = criterion
        # multi-host (DCN): one global mesh over every process's devices;
        # config.train.batch_size stays the GLOBAL batch size, each process
        # feeds its own row-slice (see _shard). Call
        # vlp3d.parallel.distributed.dist_init() before constructing the
        # Solver to enable this.
        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        # tp > 1: a 2D (data, model) mesh with Megatron-style weight
        # shardings (parallel/tensor_parallel.py) — a TPU-native extension
        # beyond the reference's DataParallel-only story
        self.tp = tp
        # zero1: shard the AdamW moment buffers over the data axis
        # (parallel/zero.py) — ZeRO stage 1, 1/N optimizer memory per
        # chip; composes with tp (2D-mesh param-aware moment specs) and
        # with multi-host DCN meshes (distributed.place_global)
        self.zero1 = zero1
        # donate: alias the train state's buffers into the jitted step's
        # outputs (donate_argnums) so params/opt-state are updated in
        # place on device instead of living twice during the update —
        # the transient saving is one full state copy of HBM. Applied
        # only once the state is placed (out_shardings pinned to the
        # input layout, so every donated buffer is layout-compatible
        # and actually reused). The reference has no equivalent (torch
        # optimizers mutate in place by construction).
        self.donate = donate
        if mesh is not None:
            self.mesh = mesh
        elif tp > 1:
            from vlp3d.parallel.tensor_parallel import make_mesh_2d

            n_dev = len(jax.devices())
            if n_dev % tp:
                raise ValueError(f"{n_dev} devices not divisible by tp={tp}")
            dp = n_dev // tp
            while dp > 1 and config.train.batch_size % dp:
                dp -= 1
            self.mesh = make_mesh_2d(dp, tp)
        elif self.n_proc > 1:
            from vlp3d.parallel.distributed import global_mesh

            self.mesh = global_mesh()
        else:
            self.mesh = make_mesh_for_batch(config.train.batch_size)
        self.caption_eval_ctx = caption_eval_ctx
        # --profile_dir: capture a jax.profiler device trace (viewable in
        # TensorBoard/xprof) over `profile_steps` steady-state iterations
        # of the first epoch — the TPU equivalent of the reference's
        # hand-rolled phase timers' deeper sibling (SURVEY §5 tracing)
        self.profile_dir = profile_dir if self.is_main else None
        self.profile_steps = profile_steps
        self._profiling = False
        self.rng = jax.random.key(seed)
        self.np_rng = np.random.default_rng(seed)
        self.timers = PhaseTimers()
        self.mean_size_arr = config.dataset.mean_size_arr()

        # grad_accum > 1: mean grads over k micro-batches, one optimizer
        # update per k (effective batch = k x batch_size; LR schedules
        # count effective updates). Composes with tp / zero1 / multi-host
        # — the accumulator tree mirrors the params, so the ZeRO
        # param-aware specs shard it like a moment.
        self.grad_accum = max(int(grad_accum), 1)
        steps_per_epoch = max(
            len(train_dataset)
            // (config.train.batch_size * self.grad_accum),
            1,
        )
        # schedule selection mirrors train_3dvlp.py:180-196: --coslr ->
        # CosineAnnealingLR(T_max=min(epoch,200), eta_min=1e-5) applied
        # per param group; detection-only without coslr -> MultiStepLR
        # [80,120,160] x 0.1; otherwise the reference configures no
        # scheduler (and, due to the solver indentation quirk, never
        # trains — we train at constant LR instead).
        t_max = min(config.train.epochs, 200)
        if config.train.lr_schedule == "cosine":
            schedule = lambda e, lr0: cosine_lr(  # noqa: E731
                e, lr0, t_max, config.train.coslr_eta_min
            )
        elif config.train.lr_schedule == "step":
            schedule = lambda e, lr0: step_lr(  # noqa: E731
                e, lr0, config.train.lr_decay_steps,
                config.train.lr_decay_rate,
            )
        else:
            schedule = None
        self.optimizer = make_optimizer(
            base_lr=config.train.lr,
            module_lr=config.train.module_lr,
            weight_decay=config.train.weight_decay,
            lr_schedule=schedule,
            steps_per_epoch=steps_per_epoch,
            amsgrad=config.train.amsgrad,
            optim_name=config.train.optim_name,
            single_group=config.train.single_lr_group,
            clip_grad_value=config.train.clip_grad_value,
            grad_accum=self.grad_accum,
        )
        self._model_cache: dict = {}
        self.state: TrainState | None = None
        self.best = {
            "epoch": 0, "sum": -1e10, "ground_sum": -1e10,
            "ground_25": -1e10, "ground_5": -1e10, "caption_sum": -1e10,
        }
        # rank-0 writes only (the reference's is-main pattern): non-main
        # processes compute identical metrics but must not race on files
        self._logf = open(
            os.path.join(workdir, "log.jsonl") if self.is_main
            else os.devnull,
            "a",
        )
        # tensorboard dual writers (solver_3dvlp.py:214-221): every scalar
        # series the step emits lands under train/ and val/
        from vlp3d.utils.tb_writer import SummaryWriter

        tb_dir = (
            os.path.join(workdir, "tensorboard") if self.is_main
            else os.path.join(workdir, "tensorboard", f"rank{jax.process_index()}")
        )
        self._tb_train = SummaryWriter(os.path.join(tb_dir, "train"))
        self._tb_val = SummaryWriter(os.path.join(tb_dir, "val"))
        # wandb mirror with phase-prefixed keys (solver_3dvlp.py:531-565);
        # offline JSONL fallback when the package is absent
        from vlp3d.utils.wandb_writer import WandbWriter

        self._wandb = WandbWriter(
            workdir, enabled=use_wandb and self.is_main
        )
        self._global_step = 0

    # ------------------------------------------------------------ model
    def _bn_momentum(self, epoch: int) -> float:
        if not self.use_bn_schedule:
            return 0.9
        return 1.0 - bn_momentum_torch(
            epoch,
            self.config.train.bn_momentum_init,
            0.5,
            self.config.train.bn_decay_step,
            self.config.train.bn_momentum_min,
        )

    def _get_steps(self, epoch: int):
        """model + jitted train/eval steps for this epoch's BN momentum
        (recompiles only when the momentum value changes)."""
        m = round(self._bn_momentum(epoch), 6)
        # once a placed state exists, its layout is pinned as the train
        # step's out_shardings so the state sharding is a fixed point of
        # the step BY CONSTRUCTION — GSPMD propagation is free to choose
        # internal layouts but cannot drift the carried state (the round-3
        # ZeRO x TP failure: 296 moment leaves re-sharded after one step,
        # forcing a step-2 recompile). init_state/warm_start clear the
        # cache after (re)placement so pinning applies from step 0.
        placed = self.state is not None
        key = (m, placed)
        if key not in self._model_cache:
            train_out_shardings = None
            if placed:
                from jax.sharding import NamedSharding, PartitionSpec

                from vlp3d.parallel.zero import state_shardings

                train_out_shardings = (
                    state_shardings(self.state),
                    NamedSharding(self.mesh, PartitionSpec()),
                )
            model = JointNet(self.config, bn_momentum=m)
            train_step = jax.jit(
                make_train_step(
                    model,
                    self.config,
                    self.optimizer,
                    caption=self.caption,
                    reference=self.reference,
                    detection=self.detection,
                ),
                out_shardings=train_out_shardings,
                # state-in aliases state-out (see __init__ donate doc);
                # safe because the solver always threads the state
                # (self.state, _ = train_step(self.state, ...)) and the
                # pinned out_shardings make every leaf layout-identical
                donate_argnums=(0,) if (placed and self.donate) else (),
            )
            # multi-host: replicate eval outputs (an all-gather at step
            # end) so host-side eval code can device_get the full global
            # batch on every process
            eval_out_shardings = None
            if self.n_proc > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                eval_out_shardings = NamedSharding(self.mesh, PartitionSpec())
            eval_step = jax.jit(
                make_eval_step(
                    model,
                    self.config,
                    caption=False,
                    reference=self.reference,
                    detection=self.detection,
                ),
                out_shardings=eval_out_shardings,
            )
            self._model_cache[key] = (model, train_step, eval_step)
        return self._model_cache[key]

    def init_state(self, sample_batch: dict):
        model, _, _ = self._get_steps(0)
        self.state = create_state(
            model, self.optimizer, sample_batch, self.config.train.seed
        )
        self.state = self._place_state(self.state)
        # re-jit with out_shardings pinned to the placed layout
        self._model_cache.clear()

    def _place_state(self, new_state):
        """Put a host/train state onto the mesh with this solver's
        placement policy (multi-host replication / TP weight shardings /
        ZeRO-1 moment shardings / plain replication)."""
        if self.n_proc > 1:
            from vlp3d.parallel.distributed import (
                host_global, place_global, replicate_global,
            )

            # host_global, not np.asarray: a warm_start re-placement may
            # receive an ALREADY-placed state whose ZeRO moments are
            # sharded across processes (non-addressable to np.asarray)
            host = host_global(new_state)
            if not self.zero1:
                return replicate_global(self.mesh, host)
            # ZeRO-1 x multi-host: moments shard 1/N over the global
            # data axis; params/batch_stats/step replicate. device_put
            # cannot target non-addressable shardings — place_global can.
            from jax.sharding import PartitionSpec as P

            from vlp3d.parallel.mesh import DATA_AXIS
            from vlp3d.parallel.zero import opt_state_pspecs

            specs = jax.tree.map(lambda _: P(), host)
            specs = specs.replace(
                opt_state=opt_state_pspecs(
                    host.opt_state,
                    self.mesh.shape[DATA_AXIS],
                    params=host.params,
                )
            )
            return place_global(self.mesh, host, specs)
        if self.zero1:
            from vlp3d.parallel.zero import zero_shard_state

            param_fn = None
            if self.tp > 1:
                from vlp3d.parallel.tensor_parallel import shard_params

                param_fn = lambda p: shard_params(self.mesh, p)  # noqa: E731
            return zero_shard_state(self.mesh, new_state, param_fn=param_fn)
        if self.tp > 1:
            from vlp3d.parallel.tensor_parallel import shard_state

            return shard_state(self.mesh, new_state)
        return replicate(self.mesh, new_state)

    def _shard(self, arrays: dict, *, local: bool = False) -> dict:
        """Host batch dict -> device-sharded batch.

        Single-host: leading-axis sharding over the local mesh.
        Multi-host, local=True (the train feed): the loader already built
        ONLY this process's row-slice (BatchIterator item_slice — 1/n_proc
        of the loader work per host, bit-identical stream), so the arrays
        go straight to global assembly. local=False (the eval feed, whose
        host-side metrics read the full batch): every process builds the
        identical GLOBAL batch (same seeded loader), keeps its own
        contiguous row-slice, and the slices are assembled into global
        arrays sharded over the data axis.
        """
        if self.n_proc == 1:
            return shard_batch(self.mesh, arrays)
        from vlp3d.parallel.distributed import shard_host_batch

        if local:
            return shard_host_batch(self.mesh, arrays)

        bs = arrays["point_clouds"].shape[0]
        if bs % self.n_proc:
            raise ValueError(
                f"global batch {bs} not divisible by {self.n_proc} processes"
            )
        local_bs = bs // self.n_proc
        lo = jax.process_index() * local_bs
        local = {
            k: (
                v[lo:lo + local_bs]
                if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == bs
                else v
            )
            for k, v in arrays.items()
        }
        return shard_host_batch(self.mesh, local)

    # ------------------------------------------------------------ feeds
    def _log(self, record: dict):
        record["time"] = time.time()
        self._logf.write(json.dumps(record, default=float) + "\n")
        self._logf.flush()

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        self.train_dataset.shuffle_data()
        # multi-host: each process builds ONLY its contiguous row-slice
        # of every batch (1/n_proc of the loader work; the counter-based
        # per-item randomness makes the slice bit-identical to slicing a
        # globally-built batch — tested in test_dataset.py)
        item_slice = None
        if self.n_proc > 1:
            if cfg.train.batch_size % self.n_proc:
                raise ValueError(
                    f"global batch {cfg.train.batch_size} not divisible "
                    f"by {self.n_proc} processes"
                )
            local_bs = cfg.train.batch_size // self.n_proc
            item_slice = (jax.process_index() * local_bs, local_bs)
        loader = BatchIterator(
            self.train_dataset,
            cfg.train.batch_size,
            epoch=epoch,
            num_workers=cfg.train.num_workers,
            rng=self.np_rng,
            item_slice=item_slice,
        )
        _, train_step, _ = self._get_steps(epoch)
        n_iters = len(loader)
        agg = []
        self.timers.start("fetch")
        for it, batch in enumerate(loader):
            self.timers.stop("fetch")
            batch = self._shard(
                {k: v for k, v in batch.items() if not isinstance(v, list)},
                local=item_slice is not None,
            )
            if (
                self.profile_dir
                and not self._profiling
                and epoch == 0
                and it == 2  # skip the compile + first dispatch iters
            ):
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
                profile_stop_at = it + self.profile_steps
            self.timers.start("iter")
            self.state, metrics = train_step(self.state, batch, self.rng)
            self._global_step += 1
            if self._profiling and it + 1 == profile_stop_at:
                # materialize a metric: completion, not block_until_ready
                # (which does not block on the axon backend — PERF.md)
                float(metrics["loss"])
                jax.profiler.stop_trace()
                self._profiling = False
                self._log({"phase": "profile", "dir": self.profile_dir})
            if it % self.log_every == 0 or it == n_iters - 1:
                scal = {k: float(v) for k, v in metrics.items()}
                agg.append(scal)
                self._tb_train.add_scalars(scal, self._global_step)
                self._tb_train.add_scalars(
                    self.timers.report(), self._global_step, prefix="time/"
                )
                self._tb_train.flush()
                self._wandb.log(
                    {"iter": self._global_step, "epoch": epoch,
                     **{f"train_{k}": v for k, v in scal.items()}}
                )
                self._log(
                    {
                        "phase": "train",
                        "epoch": epoch,
                        "iter": it,
                        **scal,
                        **self.timers.report(),
                        "eta": eta_str(
                            self.timers.mean("iter"), n_iters - it
                        ),
                    }
                )
            self.timers.stop("iter")
            self.timers.start("fetch")
        self.timers.stop("fetch")
        if self._profiling:  # epoch shorter than the profile window
            jax.profiler.stop_trace()
            self._profiling = False
        # per-device HBM high-water mark (the number that decides whether
        # a config fits; {} on backends without memory_stats — SURVEY §5
        # observability, a dimension the reference lacks entirely)
        from vlp3d.utils.memory import device_memory_mb

        mem = device_memory_mb()
        if mem:
            self._log({"phase": "memory", "epoch": epoch, **mem})
            self._tb_train.add_scalars(mem, self._global_step, prefix="mem/")
        return {
            k: float(np.mean([a[k] for a in agg]))
            for k in agg[0]
        } if agg else {}

    def eval_epoch(self, epoch: int) -> dict:
        cfg = self.config
        loader = BatchIterator(
            self.val_dataset,
            cfg.train.batch_size,
            epoch=epoch,
            drop_last=False,
            num_workers=cfg.train.num_workers,
            rng=self.np_rng,
        )
        _, _, eval_step = self._get_steps(epoch)
        ious, multiple, others, lang_accs, scalars = [], [], [], [], []
        ans_hit1 = ans_hit10 = 0.0
        ans_n = 0
        for batch in loader:
            arrays = {
                k: v for k, v in batch.items() if not isinstance(v, list)
            }
            # fixed-size eval: pad the trailing partial batch
            b = arrays["point_clouds"].shape[0]
            pad = cfg.train.batch_size - b
            if pad:
                arrays = {
                    k: (
                        np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)]
                        )
                        if hasattr(v, "ndim") and v.ndim >= 1
                        and v.shape[0] == b
                        else v
                    )
                    for k, v in arrays.items()
                }
            sharded = self._shard(arrays)
            out, metrics = eval_step(self.state, sharded)
            out_np = jax.device_get(
                {
                    k: out[k]
                    for k in (
                        "objectness_scores", "cluster_ref", "pred_center",
                        "pred_size", "pred_heading", "sem_cls_scores",
                        "lang_scores", "answer_scores",
                    )
                    if k in out
                }
            )
            if pad:
                full = cfg.train.batch_size
                l = arrays["input_ids"].shape[1]

                def unpad(v):
                    if not hasattr(v, "ndim") or v.ndim == 0:
                        return v
                    if v.shape[0] == full:
                        return v[:b]
                    if v.shape[0] == full * l:
                        return v.reshape(full, l, *v.shape[1:])[:b].reshape(
                            b * l, *v.shape[1:]
                        )
                    return v

                out_np = {k: unpad(v) for k, v in out_np.items()}
                arrays = {k: unpad(v) for k, v in arrays.items()}
            g = get_eval(
                out_np,
                arrays,
                mean_size_arr=self.mean_size_arr,
                use_lang_classifier=self.config.model.use_lang_classifier,
            )
            ious += g["ref_iou"]
            multiple += g["ref_multiple_mask"]
            others += g["ref_others_mask"]
            lang_accs.append(g["lang_acc"])
            scalars.append({k: float(v) for k, v in metrics.items()})
            if "answer_scores" in out_np and "answer_cats" in arrays:
                # answer EM@1/@10 over valid questions (the reference's VQA
                # solver metric, lib/vqa/eval_helper.py:221-235; its batch
                # is one question per row, so the joint chunked equivalent
                # masks padded rows by lang_num). numpy on the fetched
                # logits — no per-batch eager device dispatches.
                scores = np.asarray(out_np["answer_scores"])
                cats = np.asarray(arrays["answer_cats"], np.float32)
                b_, l_ = cats.shape[:2]
                cats = cats.reshape(b_ * l_, -1)
                valid = (
                    np.arange(l_)[None, :]
                    < np.asarray(arrays["lang_num"])[:, None]
                ).reshape(-1)
                at1 = scores.argmax(axis=1)
                hit1 = cats[np.arange(len(at1)), at1]
                k10 = min(10, scores.shape[1])
                topk = np.argpartition(-scores, k10 - 1, axis=1)[:, :k10]
                hit10 = np.take_along_axis(cats, topk, axis=1).max(axis=1)
                ans_hit1 += float(hit1[valid].sum())
                ans_hit10 += float(hit10[valid].sum())
                ans_n += int(valid.sum())

        ious_np = np.asarray(ious)
        result = {
            "iou_rate_0.25": float((ious_np >= 0.25).mean()) if len(ious) else 0.0,
            "iou_rate_0.5": float((ious_np >= 0.5).mean()) if len(ious) else 0.0,
            "lang_acc": float(np.mean(lang_accs)) if lang_accs else 0.0,
            **final_eval_breakdown(ious, multiple, others),
        }
        if ans_n:
            result["answer_acc_at1"] = ans_hit1 / ans_n
            result["answer_acc_at10"] = ans_hit10 / ans_n
        if self.caption and self.caption_eval_ctx is not None:
            result.update(self.caption_eval(epoch))
        if scalars:
            for k in scalars[0]:
                result[k] = float(np.mean([s[k] for s in scalars]))
        val_scalars = {
            k: v for k, v in result.items() if np.ndim(v) == 0
        }
        self._tb_val.add_scalars(
            {k: float(v) for k, v in val_scalars.items()
             if isinstance(v, (int, float))},
            self._global_step,
        )
        self._tb_val.flush()
        self._wandb.log(
            {"epoch": epoch, **{
                f"val_{k}": float(v) for k, v in val_scalars.items()
                if isinstance(v, (int, float))
            }}
        )
        self._log({"phase": "val", "epoch": epoch, **val_scalars})
        return result

    def caption_eval(self, epoch: int) -> dict:
        """Greedy-decode captions per proposal, gate by NMS + IoU>=0.5
        against assigned GT, score BLEU/CIDEr/ROUGE/METEOR
        (eval_cap, lib/joint/eval_helper.py:278-357)."""
        import jax.numpy as jnp

        from vlp3d.eval.captioning import (
            collect_caption_candidates,
            score_captions,
        )
        from vlp3d.losses.detection import compute_objectness_loss
        from vlp3d.models.caption import CaptionDecoder, greedy_decode

        ctx = self.caption_eval_ctx
        cfg = self.config
        model, _, eval_step = self._get_steps(epoch)
        decoder = CaptionDecoder(
            vocab_size=cfg.model.vocab_size, max_len=cfg.model.max_des_len + 2
        )
        cap_vars = {"params": self.state.params["caption"]}

        # jitted: eager nn_distance dispatches hundreds of tiny ops — a
        # ~30 ms round trip each over the axon TPU tunnel
        assign_objects = jax.jit(
            lambda xyz, scores, centers: compute_objectness_loss(
                xyz, scores, centers
            )[3]
        )

        loader = BatchIterator(
            self.val_dataset, cfg.train.batch_size, epoch=epoch,
            num_workers=cfg.train.num_workers, rng=self.np_rng,
        )
        candidates: dict = {}
        for batch in loader:
            arrays = {
                k: v for k, v in batch.items() if not isinstance(v, list)
            }
            sharded = self._shard(arrays)
            out, _ = eval_step(self.state, sharded)
            feats = out["aggregated_vote_features"]
            b, k, c = feats.shape
            obj_token = feats.reshape(b * k, 1, c)
            ys = greedy_decode(
                decoder, cap_vars, obj_token, cfg.model.max_des_len
            )
            out_np = jax.device_get(
                {
                    key: out[key]
                    for key in (
                        "pred_center", "pred_size", "pred_heading",
                        "objectness_scores", "sem_cls_scores",
                        "aggregated_vote_xyz",
                    )
                }
            )
            out_np["lang_cap_ids"] = np.asarray(ys).reshape(b, k, -1)
            assignment = assign_objects(
                jnp.asarray(out_np["aggregated_vote_xyz"]),
                jnp.asarray(out_np["objectness_scores"]),
                jnp.asarray(arrays["center_label"][..., :3]),
            )
            collect_caption_candidates(
                out_np,
                {**arrays, "scene_id": batch["scene_id"]},
                ctx["tokenizer"],
                ctx["organized"],
                object_assignment=np.asarray(assignment),
                candidates=candidates,
            )
        return score_captions(ctx["corpus"], candidates)

    # ------------------------------------------------------------ loop
    def _snapshot(self, name: str) -> None:
        if not self.is_main:
            return  # rank-0 writes (values are replicated across hosts)
        params, stats = self.state.params, self.state.batch_stats
        if self.n_proc > 1:
            # materialize fully-replicated global arrays host-side; the
            # checkpoint layer then never sees non-addressable buffers
            params, stats = jax.tree.map(np.asarray, (params, stats))
        ckpt.save_params(self.workdir, name, params, stats)

    def __call__(
        self, epochs: int, *, eval_every: int = 1, start_epoch: int = 0
    ) -> dict:
        """Run epochs [start_epoch, epochs). start_epoch > 0 resumes the
        epoch/curriculum clock after a checkpoint restore (the epoch-50
        loss switches, BN-momentum schedule, and best-model taxonomy all
        key on the true epoch number; the reference's --use_checkpoint
        restores weights but restarts that clock at 0,
        train_3dvlp.py:160-171)."""
        # Preemption handling: TPU-VM/SLURM preemption delivers SIGTERM;
        # route it into the same save-and-exit path as KeyboardInterrupt
        # (the reference only handles ^C, solver_3dvlp.py:356-359).
        import signal
        import threading

        old_term = None
        if threading.current_thread() is threading.main_thread():
            def _on_term(signum, frame):
                raise KeyboardInterrupt
            old_term = signal.signal(signal.SIGTERM, _on_term)
        epoch = start_epoch
        # last epoch whose training fully completed — what the interrupt
        # checkpoint must be stamped with. Stamping the CURRENT epoch
        # would make --auto_resume skip the interrupted epoch's remaining
        # batches; stamping done_epoch replays it from the top instead
        # (conservative: a few duplicated updates, never silently-missing
        # training).
        done_epoch = start_epoch - 1
        try:
            for epoch in range(start_epoch, epochs):
                self.train_epoch(epoch)
                self._snapshot("model_last")
                if epoch == 49:
                    self._snapshot("epoch_50")

                if (epoch + 1) % eval_every == 0:
                    val = self.eval_epoch(epoch)
                    ground_sum = val["iou_rate_0.5"]
                    # criterion 'sum' = 2 x iou_rate_0.5 (solver:1126-1128).
                    # Any val-metric name selects on that metric — the VQA
                    # solver's cur_criterion="answer_acc_at1" path
                    # (lib/vqa/solver.py:503-506). Unknown names leave
                    # cur_best 0 as the joint reference does (:1129-1135).
                    cur_best = (
                        ground_sum * 2 if self.criterion == "sum"
                        else float(val.get(self.criterion, 0.0))
                    )
                    if cur_best > self.best["sum"]:
                        self.best.update(
                            epoch=epoch + 1, sum=cur_best, **{
                                k: v for k, v in val.items()
                                if np.ndim(v) == 0
                            }
                        )
                        self._snapshot("model")
                    if ground_sum > self.best["ground_sum"]:
                        self.best["ground_sum"] = ground_sum
                        self._snapshot("ground_model")
                    if val["iou_rate_0.25"] > self.best["ground_25"]:
                        self.best["ground_25"] = val["iou_rate_0.25"]
                        self._snapshot("ground_model_25")
                    if val["iou_rate_0.5"] > self.best["ground_5"]:
                        self.best["ground_5"] = val["iou_rate_0.5"]
                        self._snapshot("ground_model_5")
                    if "bleu-4" in val:
                        # caption best (solver_3dvlp.py:1166-1181):
                        # caption_model.pth on best bleu-4+cider+rouge+meteor
                        cap_metrics = ("bleu-4", "cider", "rouge", "meteor")
                        caption_sum = float(
                            sum(val[m] for m in cap_metrics)
                        )
                        if caption_sum > self.best["caption_sum"]:
                            self.best["caption_sum"] = caption_sum
                            self.best["best_caption_epoch"] = epoch + 1
                            for m in cap_metrics:
                                self.best[f"best_caption_{m}"] = float(val[m])
                            self._snapshot("caption_model")

                # the epoch counts as done only once its eval + best-model
                # snapshotting completed: an interrupt landing during
                # eval_epoch(E) then replays E on --auto_resume instead of
                # silently skipping E's eval/taxonomy updates (replayed
                # training is duplicated-but-never-missing, the same
                # conservative policy as mid-epoch interrupts).
                done_epoch = epoch

                if epoch % 10 == 0 and epoch != 0:
                    self._save_full_checkpoint(epoch)
        except KeyboardInterrupt:
            # save-and-exit on interrupt/preemption (solver_3dvlp.py:356-359).
            # With donation, an interrupt landing INSIDE a train-step
            # dispatch leaves self.state pointing at donated (deleted)
            # buffers. Probe liveness BEFORE attempting the save: orbax's
            # save(force=True) deletes the existing checkpoint dir before
            # serializing, so a save that would fail on deleted buffers
            # must not start — it would destroy the last good checkpoint.
            live = self.state is not None and not any(
                leaf.is_deleted()
                for leaf in jax.tree.leaves(self.state)
                if isinstance(leaf, jax.Array)
            )
            if self.n_proc > 1:
                # SIGTERM lands at different instants on different hosts,
                # so ranks can disagree on `live`; the save is a
                # collective (host_global all-gather), and a rank
                # entering it alone hangs until the preemption deadline.
                # Make the decision collective FIRST: save only if every
                # rank is live, else all skip (the last periodic
                # checkpoint stands).
                from vlp3d.parallel.distributed import all_processes_agree

                live = all_processes_agree(bool(live))
            # never REGRESS the on-disk resume record: an interrupt
            # before any epoch of THIS call completed must not overwrite
            # whatever checkpoint already exists (observed: re-running a
            # finished run and preempting it instantly re-stamped epoch
            # -1 over the completed record, rewinding --auto_resume).
            # The decision uses only done_epoch/start_epoch — identical
            # on every rank by construction — so under multi-host no
            # rank can disagree and enter the collective save alone
            # (reading checkpoint_meta here would reintroduce exactly
            # that divergence: only rank 0 writes it).
            if live and done_epoch >= start_epoch:
                self._save_full_checkpoint(done_epoch)
                print(f"interrupted during epoch {epoch} — checkpoint "
                      f"(through epoch {done_epoch}) saved to "
                      f"{self.workdir}")
            elif live:
                print(f"interrupted during epoch {epoch} before any "
                      f"epoch of this run completed — existing "
                      f"checkpoint (if any) stands; nothing saved")
            else:
                print(f"interrupted during epoch {epoch} mid-step; live "
                      f"state was donated — resume from the existing "
                      f"checkpoint in {self.workdir}")
            self._log({"phase": "interrupt", "epoch": epoch})
            self._finish()
            return self.best
        finally:
            if old_term is not None:
                signal.signal(signal.SIGTERM, old_term)
        self._save_full_checkpoint(epochs - 1)
        self._finish()
        return self.best

    def _save_full_checkpoint(self, epoch: int) -> None:
        state = self.state
        if self.n_proc > 1:
            # every process participates in the all-gather of any
            # cross-host ZeRO-sharded moments (host_global is a
            # collective); only rank 0 then writes
            from vlp3d.parallel.distributed import host_global

            state = host_global(state)
        if not self.is_main:
            return
        ckpt.save_checkpoint(self.workdir, state, self.best, epoch)

    def _finish(self) -> None:
        """Best-metric report + all_scalars.json export (the reference's
        _finish, solver_3dvlp.py:1221-1245; checkpoints are already saved
        by the caller)."""
        lines = ["best model at epoch %d" % self.best.get("epoch", 0)]
        lines += [
            f"  {k}: {v:.6f}" if isinstance(v, float) else f"  {k}: {v}"
            for k, v in sorted(self.best.items())
        ]
        report = "\n".join(lines)
        if self.is_main:
            with open(os.path.join(self.workdir, "log.txt"), "a") as f:
                f.write(report + "\n")
        self._log({"phase": "best", **self.best})
        self._tb_train.export_scalars_to_json()
        self._tb_val.export_scalars_to_json()
        self._wandb.finish()
        ckpt.wait_until_finished()  # join any in-flight async snapshot

    def warm_start(self, path: str) -> tuple[int, int]:
        """strict=False restore from a save_params snapshot into the live
        state (the reference's --pretrain, train_3dvlp.py:115-121)."""
        assert self.state is not None, "call init_state first"
        merged, n_restored, n_skipped = ckpt.load_params_partial(
            path,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            },
        )
        from vlp3d.train.state import canonicalize_tree

        new_state = canonicalize_tree(
            self.state.replace(
                params=merged["params"],
                batch_stats=merged["batch_stats"],
            )
        )
        # keep the placement (Megatron/ZeRO shardings) the state was
        # created with; re-jit so pinned out_shardings/donation bind to
        # the NEW placed state, not a stale cached entry
        self.state = self._place_state(new_state)
        self._model_cache.clear()
        return n_restored, n_skipped
