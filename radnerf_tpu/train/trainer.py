"""Training / evaluation / inference engine.

Reference: nerf/utils.py:570-1427 (Trainer): train & eval & test loops, AMP,
EMA (decay 0.95, updated every 1000 steps, utils.py:578,1181), per-group
Adam (betas 0.9/0.99, eps 1e-15, main.py:204), exponential LR decay
0.1^(step/iters) (0.05 for lips finetune, main.py:216-219), density-grid
update every update_extra_interval=16 steps (utils.py:1158-1161),
mark_untrained_grid at train start (:899-901), rolling checkpoints, metric
reporting, mp4 export at 25 fps (:969-971), tensorboard + file logging.

TPU re-design:
- the whole optimization step (render -> loss -> grad -> optax update ->
  EMA) is ONE jitted function; AMP GradScaler machinery disappears
  (bfloat16 needs no loss scaling),
- per-group learning rates via optax.multi_transform keyed on
  models.network.param_groups; the torso stage freezes head params with
  optax.set_to_zero (the analogue of requires_grad=False, main.py:153-157),
- grid maintenance runs as jitted pure state updates on the same cadence,
- optional data parallelism: params/state replicated, ray batches sharded
  over a 1-D mesh; XLA inserts the gradient psum over ICI automatically.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import optax

from ..config import Options
from ..data.rays import get_audio_features, get_rays
from ..models import (
    NetworkConfig,
    RenderConfig,
    RendererState,
    encode_audio,
    init_params,
    mark_untrained_grid,
    param_groups,
    render_rays,
    update_density_grid,
    update_torso_grid,
)
from . import checkpoint as ckpt_lib
from .losses import head_loss, torso_loss
from .metrics import LPIPS


def build_optimizer(net_cfg: NetworkConfig, opt: Options):
    """Per-group Adam with exponential LR decay (main.py:204, 216-219)."""
    decay_base = 0.05 if opt.finetune_lips else 0.1
    group_lr = {
        "grid": opt.lr,
        "net": opt.lr_net,
        "att": opt.lr_net * 5,
        "camera": 1e-5,
    }

    def make_tx(base_lr):
        sched = lambda step: base_lr * decay_base ** (step / opt.iters)  # noqa: E731
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_schedule(sched),
            optax.scale(-1.0),
        )

    transforms = {g: make_tx(lr) for g, lr in group_lr.items()}
    transforms["frozen"] = optax.set_to_zero()

    groups = param_groups(net_cfg)

    def label_fn(params):
        return {
            k: jax.tree_util.tree_map(lambda _: groups.get(k, "net"), v)
            for k, v in params.items()
        }

    return optax.multi_transform(transforms, label_fn)


class Trainer:
    """Engine driving training, evaluation, and video inference."""

    def __init__(
        self,
        name: str,
        opt: Options,
        net_cfg: Optional[NetworkConfig] = None,
        render_cfg: Optional[RenderConfig] = None,
        params: Optional[dict] = None,
        metrics=(),
        workspace: Optional[str] = None,
        ema_decay: Optional[float] = None,
        ema_update_interval: int = 1000,
        eval_interval: int = 1,
        max_keep_ckpt: int = 2,
        use_checkpoint: str = "latest",
        use_tensorboard: bool = True,
        mute: bool = False,
        cap_overrides=None,
    ):
        self.name = name
        self.opt = opt
        self.net_cfg = net_cfg or NetworkConfig.from_options(opt)
        self.render_cfg = render_cfg or RenderConfig.from_options(opt)
        # Capacity fields the user EXPLICITLY overrode, by PROVENANCE: CLI
        # flags actually typed (Options.cap_overrides, recorded by
        # main.py:options_from_args) or the cap_overrides constructor arg.
        # load_checkpoint restores trained capacities from checkpoint meta;
        # a deliberate override (e.g. the exhaustive debug config
        # --ray_capacity_frac 1.0 --cull_T 0 --sample_capacity_mult 16)
        # must win over the checkpoint's adapted values. A constructor-
        # supplied RenderConfig is a *starting* config, NOT an override —
        # diffing it against dataclass defaults (the round-4 heuristic)
        # silently skipped restoring trained capacities for every custom
        # config, the exact silent-drop bug class persistence exists to
        # kill (PARITY.md: 15 dB vs 32.4 dB).
        _cap_names = frozenset((
            "ray_capacity_frac", "sample_capacity_mult", "march_iters",
            "sample_slots", "torso_capacity_frac", "march_group_mult",
            "march_group_slots",
        ))
        self._user_cap_fields = set(getattr(opt, "cap_overrides", ()) or ())
        if cap_overrides:
            self._user_cap_fields |= set(cap_overrides)
        unknown = self._user_cap_fields - _cap_names
        if unknown:
            raise ValueError(
                f"cap_overrides names unknown capacity fields {sorted(unknown)}; "
                f"valid: {sorted(_cap_names)}"
            )
        self.metrics = list(metrics)
        self.workspace = workspace or opt.workspace
        self.ema_decay = ema_decay
        self.ema_update_interval = ema_update_interval
        self.eval_interval = eval_interval
        self.max_keep_ckpt = max_keep_ckpt
        self.use_tensorboard = use_tensorboard
        self.mute = mute
        self.flip_finetune_lips = opt.finetune_lips
        self.time_stamp = time.strftime("%Y-%m-%d_%H-%M-%S")

        self.key = jax.random.PRNGKey(opt.seed)
        self.params = params if params is not None else init_params(
            self._next_key(), self.net_cfg
        )
        self.state = RendererState.create(self.render_cfg)
        self.tx = build_optimizer(self.net_cfg, opt)
        self.opt_state = self.tx.init(self.params)
        self.ema_params = (
            jax.tree_util.tree_map(jnp.array, self.params) if ema_decay else None
        )

        # in-graph perceptual loss for lips finetune / patch training
        self.lpips = LPIPS() if (opt.finetune_lips or opt.patch_size > 1) else None
        if 1 < opt.patch_size < 32:
            # alex-LPIPS needs >= 32 px: smaller inputs produce empty feature
            # maps mid-stack (NaN here, a hard error in torch lpips)
            raise ValueError(
                f"patch_size={opt.patch_size}: patch-based perceptual training "
                f"requires patch_size >= 32 (alex-LPIPS receptive field)"
            )

        # optional data parallelism over the device mesh: params/state
        # replicated, ray batches sharded; XLA inserts the gradient psum
        # over ICI (the reference's dormant DDP surface, utils.py:621-623)
        self.mesh = None
        if opt.data_parallel and len(jax.devices()) > 1:
            from ..parallel import create_mesh, replicate

            self.mesh = create_mesh()
            self.params = replicate(self.mesh, self.params)
            self.state = replicate(self.mesh, self.state)

        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [], "checkpoints": [],
                      "best_result": None}
        self.writer = None

        # workspace / logging (utils.py:668-700)
        self.log_ptr = None
        if self.workspace:
            os.makedirs(self.workspace, exist_ok=True)
            self.log_path = os.path.join(self.workspace, f"log_{name}.txt")
            self.log_ptr = open(self.log_path, "a+")
            self.ckpt_path = os.path.join(self.workspace, "checkpoints")
            self.best_path = os.path.join(self.ckpt_path, f"{name}.npz")
            os.makedirs(self.ckpt_path, exist_ok=True)

        self.log(
            f"[INFO] Trainer: {name} | {self.time_stamp} | "
            f"{jax.default_backend()} | "
            f"{'bf16' if opt.fp16 else 'fp32'} | {self.workspace}"
        )
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(self.params))
        self.log(f"[INFO] #parameters: {n_params}")

        if self.lpips is not None:
            if getattr(opt, "lpips_weights", ""):
                self.lpips.load_weights_file(opt.lpips_weights)
                self.log(f"[INFO] LPIPS calibrated from {opt.lpips_weights}")
            else:
                self.log(
                    "[WARN] perceptual loss is active (finetune_lips/patch) "
                    "but no --lpips_weights given: LPIPS runs on UNCALIBRATED "
                    "random filters and is NOT the reference's pretrained "
                    "alex-LPIPS term."
                )

        # jit caches (before _restore: capacity restore invalidates them)
        self._train_step_fn = {}
        self._render_fn = {}
        self._packed_cache = None
        self._cap_restored = False

        if self.workspace and params is None:
            self._restore(use_checkpoint)
        # bound on adaptive-capacity recompiles (each costs minutes on the
        # remote-compile service); _adapt_capacities warns loudly if the cap
        # binds while telemetry still shows dropped work
        self._adapt_cap = 6

    # ------------------------------------------------------------- plumbing
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def log(self, *args):
        if not self.mute:
            print(*args)
        if self.log_ptr:
            print(*args, file=self.log_ptr)
            self.log_ptr.flush()

    def _restore(self, use_checkpoint: str):
        """Checkpoint selector semantics (utils.py:682-700)."""
        if use_checkpoint == "scratch":
            self.log("[INFO] Training from scratch ...")
            return
        if use_checkpoint in ("latest", "latest_model"):
            path = ckpt_lib.latest_checkpoint(self.ckpt_path, self.name)
            if path is None:
                self.log("[WARN] No checkpoint found, model randomly initialized.")
                return
            self.load_checkpoint(path, model_only=use_checkpoint == "latest_model")
            return
        if use_checkpoint == "best":
            if os.path.exists(self.best_path):
                self.load_checkpoint(self.best_path)
            else:
                path = ckpt_lib.latest_checkpoint(self.ckpt_path, self.name)
                if path:
                    self.load_checkpoint(path)
            return
        self.log(f"[INFO] Loading {use_checkpoint} ...")
        self.load_checkpoint(use_checkpoint)

    # -------------------------------------------------------- step builders
    def _get_train_step(self, shape_sig):
        if shape_sig in self._train_step_fn:
            return self._train_step_fn[shape_sig]

        net_cfg, rc = self.net_cfg, self.render_cfg
        opt = self.opt
        lpips_fn = self.lpips.loss_fn() if self.lpips is not None else None
        loss_mode, lips_shape = shape_sig[0], shape_sig[1]
        use_lpips = loss_mode in ("rect", "patch")

        rc = self.render_cfg  # rebound: may have been adaptively resized

        @jax.jit
        def step(params, opt_state, state, batch, global_step, noise_key):
            def loss_fn(p):
                noises = jax.random.uniform(noise_key, (batch["rays_o"].shape[0],))
                results, state2 = render_rays(
                    p, net_cfg, rc, state,
                    batch["rays_o"], batch["rays_d"], batch.get("auds"),
                    batch["bg_coords"], batch["poses"], batch.get("eye"),
                    batch["index"], batch["bg_color"],
                    noises=noises, training=True,
                )
                # color_space='linear': train against linearized GT
                # (reference nerf/utils.py:736-737 — predictions then live in
                # linear space and are srgb-encoded only at save time)
                gt_images = batch.get("images")
                gt_torso = batch.get("bg_torso_color")
                if opt.color_space == "linear":
                    from ..utils.color import srgb_to_linear

                    if opt.torso:
                        gt_torso = srgb_to_linear(gt_torso)
                    else:
                        gt_images = srgb_to_linear(gt_images)
                if opt.torso:
                    loss = torso_loss(results, gt_torso)
                else:
                    loss = head_loss(
                        results, gt_images, batch["face_mask"],
                        global_step, opt.iters, opt.lambda_amb,
                        lpips_fn=lpips_fn if use_lpips else None,
                        lpips_shape=lips_shape if use_lpips else None,
                        lpips_weight=0.01 if loss_mode == "rect" else 0.001,
                    )
                # group telemetry rides along (zeros when march_group off)
                # so an undersized grouped-march buffer adapts instead of
                # silently dropping groups (the grouped marcher is a
                # measured 1.47x win on sparse scenes, PERFORMANCE.md)
                stats = jnp.stack(
                    [results["n_hit"], results["n_samples_needed"],
                     results["n_max_count"], results["n_k_span"],
                     results["n_groups_needed"], results["n_group_max"]]
                )
                return loss, (stats, state2)

            (loss, (stats, state2)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state2 = self.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, state2, loss, stats

        self._train_step_fn[shape_sig] = step
        return step

    # ---------------------------------------------- adaptive capacities
    def _adapt_capacities(self, stats, n_rays: int):
        """The mean_count analogue (raymarching.py:224-229): resize the
        static ray/sample capacities to measured occupancy via the shared
        sizing rules (train/capacity.py), bucketed so compiles stay bounded
        while capacities stay tight AND safe."""
        from .capacity import adapt_render_config, ray_capacity

        # each bucket change recompiles the train step (minutes on this
        # environment's remote-compile service) — cap the churn
        self._adapt_count = getattr(self, "_adapt_count", 0)
        n_hit, n_needed = int(stats[0]), int(stats[1])
        rc = self.render_cfg
        if self._adapt_count >= self._adapt_cap:
            # the cap exists to bound recompiles, but binding it while the
            # scene still outgrows the static capacities silently DROPS work
            # (the exact bug class this mechanism kills) — be loud about it
            R_now = ray_capacity(n_rays, rc.ray_capacity_frac)
            from ..models.renderer import RenderConfig
            S_now = RenderConfig.sample_capacity(R_now, rc.sample_capacity_mult)
            # span truncation is invisible in n_hit/n_needed (a too-short
            # orbit also SHRINKS the sample count) — check it explicitly
            K_now = (rc.march_iters if rc.march_iters is not None
                     else rc.march_config().n_march_iters)
            span = int(stats[3]) if stats.shape[0] > 3 else 0
            groups_over = False
            if rc.march_group and stats.shape[0] > 5:
                G_now = RenderConfig.sample_capacity(R_now, rc.march_group_mult)
                groups_over = (
                    int(stats[4]) > G_now
                    or (rc.march_group_slots is not None
                        and int(stats[5]) > rc.march_group_slots)
                )
            if n_hit > R_now or n_needed > S_now or span > K_now or groups_over:
                self.log(
                    f"[WARN] adaptive-capacity cap ({self._adapt_cap} recompiles) "
                    f"reached while capacities are undersized: hits {n_hit} vs "
                    f"ray capacity {R_now}, samples {n_needed} vs capacity "
                    f"{S_now}, window span {span} vs orbit {K_now} — work "
                    f"beyond capacity is being DROPPED. Raise "
                    f"--ray_capacity_frac/--sample_capacity_mult/--march_iters "
                    f"or the cap (Trainer._adapt_cap)."
                )
            return
        n_max = int(stats[2]) if stats.shape[0] > 2 else rc.max_steps
        n_k_span = int(stats[3]) if stats.shape[0] > 3 else None
        n_groups = n_group_max = None
        if rc.march_group and stats.shape[0] > 5:
            n_groups = int(stats[4]) or None
            n_group_max = int(stats[5]) or None
        radius = float(self.state.occ_sphere[3])

        rc2 = adapt_render_config(rc, n_hit, n_needed, n_max, n_rays, radius,
                                  n_k_span=n_k_span, n_groups=n_groups,
                                  n_group_max=n_group_max)
        if rc2 is not None:
            self.render_cfg = rc2
            self._train_step_fn.clear()
            self._render_fn.clear()
            self._adapt_count += 1
            self.log(
                f"[INFO] adapt capacities: ray_frac={rc2.ray_capacity_frac:.3f} "
                f"sample_mult={rc2.sample_capacity_mult} "
                f"march_iters={rc2.march_iters} "
                f"sample_slots={rc2.sample_slots} "
                f"(hits={n_hit}, samples={n_needed}, max_count={n_max}, "
                f"occ_r={radius:.3f})"
            )

    def _get_render_fn(self):
        if "render" not in self._render_fn:
            net_cfg, rc = self.net_cfg, self.render_cfg

            @jax.jit
            def render(params, state, batch, noises=None):
                results, state2 = render_rays(
                    params, net_cfg, rc, state,
                    batch["rays_o"], batch["rays_d"], batch.get("auds"),
                    batch["bg_coords"], batch["poses"], batch.get("eye"),
                    batch["index"], batch["bg_color"],
                    noises=noises, training=False,
                )
                return results, state2

            self._render_fn["render"] = render
        return self._render_fn["render"]

    # ------------------------------------------------------ grid maintenance
    def _get_maintenance_fn(self, kind: str):
        """Jitted grid-maintenance step (cached; cleared on capacity adapt).

        Maintenance MUST be one jitted call, not eager op-by-op: under data
        parallelism the train steps ahead of it in the queue contain the
        gradient psum, and eagerly dispatched multi-device ops can overtake
        that all-reduce on a subset of device queues — the rendezvous then
        times out and XLA aborts the process (observed on the 8-device CPU
        mesh: `rendezvous.cc` "only 5 of 8 arrived"). A single jitted
        executable keeps every device queue identically ordered."""
        key = ("maintenance", kind)
        if key not in self._render_fn:
            net_cfg, rc = self.net_cfg, self.render_cfg
            if kind == "head":

                @jax.jit
                def fn(params, state, auds, eye, key_):
                    enc_a = (
                        encode_audio(params, net_cfg, auds)
                        if auds is not None else None
                    )
                    return update_density_grid(
                        params, net_cfg, rc, state, enc_a, eye, key_
                    )
            else:

                @jax.jit
                def fn(params, state, pose6, pidx, key_):
                    code = (
                        params["individual_codes_torso"][pidx]
                        if net_cfg.ind_dim_torso > 0 else None
                    )
                    return update_torso_grid(
                        params, net_cfg, rc, state, pose6, code, key_
                    )

            self._render_fn[key] = fn
        return self._render_fn[key]

    def _update_extra_state(self, dataset):
        """update_extra_state cadence hook (renderer.py:383-501): random audio
        window + random eye for the head grid; random pose + torso code for
        the torso grid."""
        rng = np.random.default_rng(int(self.global_step) + self.opt.seed)
        if dataset.auds is not None:
            ridx = int(rng.integers(0, dataset.auds.shape[0]))
            auds = jnp.asarray(get_audio_features(dataset.auds, self.opt.att, ridx))
        else:
            auds = None
            ridx = 0
        eye = None
        if self.opt.exp_eye and dataset.eye_area is not None:
            eye = jnp.asarray(dataset.eye_area[ridx].reshape(1, 1))

        if not self.opt.torso:
            self.state = self._get_maintenance_fn("head")(
                self.params, self.state, auds, eye, self._next_key(),
            )
        else:
            pidx = int(rng.integers(0, dataset.poses.shape[0]))
            from ..data.rays import convert_poses

            pose6 = jnp.asarray(convert_poses(dataset.poses[pidx][None]))
            self.state = self._get_maintenance_fn("torso")(
                self.params, self.state, pose6,
                jnp.asarray(pidx, jnp.int32), self._next_key(),
            )

    # --------------------------------------------------------------- device
    def _to_device(self, batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if k in ("H", "W", "rect"):
                out[k] = v
            elif k == "index":
                out[k] = jnp.asarray(v, jnp.int32)
            elif v is None:
                out[k] = None
            else:
                out[k] = jnp.asarray(v)
        if self.mesh is not None:
            from ..parallel import shard_batch

            out = shard_batch(self.mesh, out)
        return out

    # ------------------------------------------------------------ train API
    def train(self, train_ds, valid_ds, max_epochs: int):
        if self.use_tensorboard:
            try:
                import tensorboardX

                self.writer = tensorboardX.SummaryWriter(
                    os.path.join(self.workspace, "run", self.name)
                )
            except ImportError:
                self.writer = None

        # mark untrained region (utils.py:899-901)
        self.state = mark_untrained_grid(
            self.render_cfg, self.state, jnp.asarray(train_ds.poses),
            tuple(train_ds.intrinsics),
        )

        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            self.train_one_epoch(train_ds)
            if self.workspace:
                self.save_checkpoint(full=True, best=False)
            if self.epoch % self.eval_interval == 0:
                self.evaluate_one_epoch(valid_ds)
                self.save_checkpoint(full=False, best=True)

        if self.writer:
            self.writer.close()

    def train_one_epoch(self, dataset):
        self.log(f"==> Start Training Epoch {self.epoch} ...")
        total_loss, local_step = 0.0, 0
        t0 = time.time()

        losses = []  # device scalars; pulled lazily to avoid per-step syncs
        last_stats = None
        for idx in dataset.epoch_indices():
            if self.global_step % self.opt.update_extra_interval == 0:
                if (self.opt.auto_capacity and last_stats is not None):
                    self._adapt_capacities(
                        np.asarray(last_stats), n_rays=int(self._last_n_rays)
                    )
                self._update_extra_state(dataset)
            local_step += 1
            self.global_step += 1

            batch = self._to_device(dataset.collate(int(idx)))
            lips_mode = bool(self.opt.finetune_lips and "rect" in batch)
            if lips_mode:
                xmin, xmax, ymin, ymax = batch["rect"]
                sig = ("rect", (xmax - xmin, ymax - ymin), batch["rays_o"].shape[0])
            elif self.opt.patch_size > 1:
                # patch training applies the perceptual term too, at 1e-3
                # (utils.py:757-781: whenever patch_size > 1, not only lips)
                p = self.opt.patch_size
                sig = ("patch", (p, p), batch["rays_o"].shape[0])
            else:
                sig = ("none", None, batch["rays_o"].shape[0])
            self._last_n_rays = batch["rays_o"].shape[0]

            step_fn = self._get_train_step(sig)
            self.params, self.opt_state, self.state, loss, last_stats = step_fn(
                self.params, self.opt_state, self.state, batch,
                jnp.asarray(self.global_step, jnp.float32), self._next_key(),
            )
            losses.append(loss)

            # flip lips finetune every other step (utils.py:769-770)
            if self.flip_finetune_lips:
                self.opt.finetune_lips = not self.opt.finetune_lips

            if self.ema_params is not None and (
                self.global_step % self.ema_update_interval == 0
            ):
                # one jitted call, not eager per-leaf ops: eager multi-device
                # dispatch can overtake the in-flight gradient psum on a
                # subset of device queues under DP and deadlock the
                # rendezvous (see _get_maintenance_fn)
                if "ema_update" not in self._render_fn:
                    d = self.ema_decay
                    self._render_fn["ema_update"] = jax.jit(
                        lambda e, p: jax.tree_util.tree_map(
                            lambda a, b: d * a + (1 - d) * b, e, p
                        )
                    )
                self.ema_params = self._render_fn["ema_update"](
                    self.ema_params, self.params
                )

            if self.writer and self.global_step % 16 == 0:
                self.writer.add_scalar("train/loss", float(loss), self.global_step)
                # LR scalar (utils.py:1189-1191); the per-group schedule is
                # base_lr * decay^(step/iters) — report the grid group's
                decay = 0.05 if self.opt.finetune_lips else 0.1
                lr = self.opt.lr * decay ** (self.global_step / self.opt.iters)
                self.writer.add_scalar("train/lr", lr, self.global_step)

        total_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        avg = total_loss / max(local_step, 1)
        self.stats["loss"].append(avg)
        dt = time.time() - t0
        cap_note = ""
        if last_stats is not None:
            # capacity-utilization telemetry: make silent work-dropping
            # impossible to miss (n_* beyond capacity means dropped rays/samples)
            st = np.asarray(last_stats)
            rc = self.render_cfg
            n_rays = int(getattr(self, "_last_n_rays", 0))
            from ..models.renderer import RenderConfig
            R = RenderConfig.ray_capacity(n_rays, rc.ray_capacity_frac)
            S = RenderConfig.sample_capacity(R, rc.sample_capacity_mult)
            cap_note = (
                f", hits {int(st[0])}/{R} rays, samples {int(st[1])}/{S}"
                + (" [DROPPING]" if int(st[0]) > R or int(st[1]) > S else "")
            )
        self.log(
            f"==> Finished Epoch {self.epoch}: loss={avg:.6f}, "
            f"{local_step / max(dt, 1e-9):.2f} steps/s{cap_note}"
        )

    # ------------------------------------------------------------- eval API
    def _eval_params(self):
        base = self.ema_params if self.ema_params is not None else self.params
        # attach corner-packed encoder tables, re-packing only when the
        # underlying params object changed (e.g. after a train epoch):
        # in-frame re-packing costs ~19 ms/frame at eval (PERFORMANCE.md)
        from ..models import precompute_packed_tables

        cached = getattr(self, "_packed_cache", None)
        if cached is None or cached[0] is not base:
            self._packed_cache = (base, precompute_packed_tables(base, self.net_cfg))
        return self._packed_cache[1]

    @staticmethod
    def _normalize_depth(depth):
        """Depth buffers are world-unit values (~3-4 at the reference working
        distance), so a raw clip(0,1)*255 dump saturates white. Normalize to
        the frame's range for visual artifacts (the reference's depth is
        near/far-normalized in-render, renderer.py:306-311)."""
        d = np.asarray(depth, np.float32)
        lo, hi = float(d.min()), float(d.max())
        return (d - lo) / max(hi - lo, 1e-6)

    def eval_step(self, batch):
        render = self._get_render_fn()
        results, _ = render(self._eval_params(), self.state, batch)
        H, W = batch["H"], batch["W"]
        pred = np.asarray(results["image"]).reshape(H, W, 3)
        depth = np.asarray(results["depth"]).reshape(H, W)
        return pred, depth

    def evaluate(self, dataset, name=None):
        self.evaluate_one_epoch(dataset, name)

    def evaluate_one_epoch(self, dataset, name=None):
        self.log(f"++> Evaluate at epoch {self.epoch} ...")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        for metric in self.metrics:
            metric.clear()
        total_loss, count = 0.0, 0
        # visual regression artifacts per eval epoch (utils.py:1259-1273)
        save_path = (
            os.path.join(self.workspace, "validation") if self.workspace else None
        )
        if save_path:
            os.makedirs(save_path, exist_ok=True)
        n = min(len(dataset), getattr(dataset, "eval_count", len(dataset)))
        for i in range(n):
            batch = self._to_device(dataset.collate(i))
            pred, depth = self.eval_step(batch)
            gt = np.asarray(batch["images"]).reshape(pred.shape[0], pred.shape[1], -1)[..., :3]
            if self.opt.color_space == "linear":
                # loss/metrics compare in linear space (utils.py:824-825);
                # only the saved PNG is srgb-encoded (:1266)
                from ..utils.color import linear_to_srgb, srgb_to_linear

                gt = np.asarray(srgb_to_linear(gt))
                pred_save = np.asarray(linear_to_srgb(np.clip(pred, 0, 1)))
            else:
                pred_save = pred
            total_loss += float(np.mean((pred - gt) ** 2))
            count += 1
            for metric in self.metrics:
                metric.update(pred, gt)
            if save_path:
                import imageio

                imageio.imwrite(
                    os.path.join(save_path, f"{name}_{i:04d}_rgb.png"),
                    (np.clip(pred_save, 0, 1) * 255).astype(np.uint8),
                )
                imageio.imwrite(
                    os.path.join(save_path, f"{name}_{i:04d}_depth.png"),
                    (np.clip(self._normalize_depth(depth), 0, 1) * 255).astype(np.uint8),
                )
        avg = total_loss / max(count, 1)
        self.stats["valid_loss"].append(avg)
        self.stats["results"].append(
            self.metrics[0].measure() if self.metrics else avg
        )
        for metric in self.metrics:
            self.log(metric.report())
            if self.writer:
                metric.write(self.writer, self.epoch, prefix="evaluate")
            metric.clear()
        self.log(f"++> Evaluate epoch {self.epoch} Finished, loss={avg:.6f}")

    # ------------------------------------------------------------- test API
    def test_step(self, batch, bg_color=None, perturb=False):
        """Render one frame (utils.py:841-868). With --data_parallel and a
        multi-chip mesh, the frame's rays shard across chips via the
        zero-collective shard_map renderer (parallel/mesh.py).

        ``perturb``: falsy for deterministic marching; an int is used as the
        jitter seed (the reference GUI passes spp as the perturb seed,
        utils.py:1076-1077, for progressive supersampling accumulation)."""
        if self.opt.exp_eye and self.opt.fix_eye >= 0:
            batch["eye"] = jnp.full((1, 1), self.opt.fix_eye, jnp.float32)
        if bg_color is not None:
            batch["bg_color"] = jnp.asarray(bg_color)
        H, W = batch["H"], batch["W"]
        noises = None
        if perturb:
            noises = jax.random.uniform(
                jax.random.PRNGKey(int(perturb)), (batch["rays_o"].shape[0],)
            )
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        # the sharded path needs a concrete audio window (shard_map specs
        # cannot carry None) — audio-less datasets fall through to the
        # single-device render, which tolerates a missing key
        if (self.mesh is not None and noises is None
                and batch.get("auds") is not None
                and batch["rays_o"].shape[0] % n_dev == 0):
            from ..parallel import replicate
            from ..parallel.mesh import make_render_frame_dp, shard_batch

            if "render_dp" not in self._render_fn:
                self._render_fn["render_dp"] = make_render_frame_dp(
                    self.mesh, self.net_cfg, self.render_cfg
                )
            ep = self._eval_params()
            cached = getattr(self, "_dp_param_cache", None)
            if cached is None or cached[0] is not ep:
                self._dp_param_cache = (ep, replicate(self.mesh, ep))
            img, depth, self.state = self._render_fn["render_dp"](
                self._dp_param_cache[1], replicate(self.mesh, self.state),
                shard_batch(self.mesh, batch), batch["auds"],
            )
            return (np.asarray(img).reshape(H, W, 3),
                    np.asarray(depth).reshape(H, W))
        render = self._get_render_fn()
        results, self.state = render(self._eval_params(), self.state, batch,
                                     noises)
        pred = np.asarray(results["image"]).reshape(H, W, 3)
        depth = np.asarray(results["depth"]).reshape(H, W)
        return pred, depth

    def test(self, dataset, save_path=None, name=None, write_image=False):
        """Render all frames -> mp4 at 25 fps (utils.py:923-973)."""
        import imageio

        save_path = save_path or os.path.join(self.workspace, "results")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        self.log(f"==> Start Test, save results to {save_path}")

        frames = []
        t0 = time.time()
        for i in range(len(dataset)):
            batch = self._to_device(dataset.collate(i))
            pred, depth = self.test_step(batch)
            if self.opt.color_space == "linear":
                # predictions live in linear space; encode for display
                # (reference nerf/utils.py:952-953)
                from ..utils.color import linear_to_srgb

                pred = np.asarray(linear_to_srgb(np.clip(pred, 0, 1)))
            img = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
            if write_image:
                imageio.imwrite(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"), img)
                imageio.imwrite(
                    os.path.join(save_path, f"{name}_{i:04d}_depth.png"),
                    (np.clip(self._normalize_depth(depth), 0, 1) * 255).astype(np.uint8),
                )
            frames.append(img)
        fps_measured = len(frames) / max(time.time() - t0, 1e-9)
        self.log(f"==> Rendered {len(frames)} frames at {fps_measured:.2f} FPS")

        video = np.stack(frames, 0)
        try:
            imageio.mimwrite(
                os.path.join(save_path, f"{name}.mp4"), video, fps=25,
                quality=8, macro_block_size=1,
            )
        except Exception:
            # no ffmpeg writer available: fall back to per-frame PNGs
            for i, img in enumerate(video):
                imageio.imwrite(os.path.join(save_path, f"{name}_{i:04d}.png"), img)
        self.log("==> Finished Test.")
        return fps_measured

    # -------------------------------------------------- interactive (GUI) API
    def train_gui(self, dataset, step: int = 16):
        """Headless interactive training burst (utils.py:976-1035)."""
        if self.global_step == 0:
            self.state = mark_untrained_grid(
                self.render_cfg, self.state, jnp.asarray(dataset.poses),
                tuple(dataset.intrinsics),
            )
        losses = []
        order = dataset.epoch_indices()
        for s in range(step):
            if self.global_step % self.opt.update_extra_interval == 0:
                self._update_extra_state(dataset)
            self.global_step += 1
            batch = self._to_device(dataset.collate(int(order[s % len(order)])))
            sig = ("none", None, batch["rays_o"].shape[0])
            step_fn = self._get_train_step(sig)
            self.params, self.opt_state, self.state, loss, _stats = step_fn(
                self.params, self.opt_state, self.state, batch,
                jnp.asarray(self.global_step, jnp.float32), self._next_key(),
            )
            losses.append(loss)
        return {"loss": float(jnp.mean(jnp.stack(losses)))}

    def test_gui(self, pose, intrinsics, W, H, auds=None, eye=0.25, index=0,
                 bg_color=None, spp=1, downscale=1):
        """Render a free-viewpoint frame (utils.py:1037-1135)."""
        from ..data.rays import convert_poses, get_bg_coords

        rH, rW = int(H * downscale), int(W * downscale)
        intr = np.asarray(intrinsics) * downscale
        rays = get_rays(np.asarray(pose, np.float32), intr, rH, rW, -1)
        batch = {
            "rays_o": rays["rays_o"],
            "rays_d": rays["rays_d"],
            "H": rH, "W": rW,
            "bg_coords": get_bg_coords(rH, rW),
            "poses": convert_poses(np.asarray(pose, np.float32)[None]),
            "auds": auds,
            "eye": np.asarray([[eye]], np.float32) if self.opt.exp_eye else None,
            "index": index,
            "bg_color": (
                np.asarray(bg_color, np.float32).reshape(-1, 3)
                if bg_color is not None else np.ones((rH * rW, 3), np.float32)
            ),
        }
        # spp > 1: perturbed re-render for progressive supersampling — the
        # caller accumulates frames; spp seeds the jitter (utils.py:1076-1077)
        pred, depth = self.test_step(self._to_device(batch),
                                     perturb=False if spp == 1 else spp)
        if (rH, rW) != (H, W):
            # dynamic-resolution rendering returns to full size for display
            # (reference nerf/utils.py:1085: bilinear rgb, nearest depth)
            import cv2

            pred = cv2.resize(np.asarray(pred), (W, H),
                              interpolation=cv2.INTER_LINEAR)
            depth = cv2.resize(np.asarray(depth), (W, H),
                               interpolation=cv2.INTER_NEAREST)
        if self.opt.color_space == "linear":
            from ..utils.color import linear_to_srgb

            pred = np.asarray(linear_to_srgb(np.clip(pred, 0, 1)))
        return {"image": pred, "depth": depth}

    # --------------------------------------------------------------- meshes
    def save_mesh(self, save_path=None, resolution: int = 256, threshold: float = 10.0):
        """Extract + export the density iso-surface (utils.py:871-891)."""
        from ..models.network import field_density
        from ..utils.mesh import extract_geometry, save_mesh_ply

        save_path = save_path or os.path.join(
            self.workspace, "meshes", f"{self.name}_{self.epoch}.ply"
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        self.log(f"==> Saving mesh to {save_path}")

        params = self._eval_params()
        net_cfg = self.net_cfg

        @jax.jit
        def query(pts):
            return field_density(params, net_cfg, pts, None, None)["sigma"]

        aabb = self.render_cfg.aabb
        vertices, triangles = extract_geometry(
            aabb[:3], aabb[3:], resolution=resolution, threshold=threshold,
            query_func=lambda p: query(jnp.asarray(p)),
        )
        save_mesh_ply(save_path, vertices, triangles)
        self.log(f"==> Finished saving mesh ({len(vertices)} verts, {len(triangles)} faces).")
        return save_path

    # ---------------------------------------------------------- checkpoints
    def _grid_shape_id(self, full=False):
        """Model-identity grid record: [levels, ch, base] plus the 2-D
        (ambient/torso) shape when it differs (``full=True`` always returns
        all 6 elements, for comparisons)."""
        c = self.net_cfg
        spatial = [c.grid_levels, c.grid_ch, c.grid_base]
        amb = [c.amb_levels, c.amb_ch, c.amb_base]
        return spatial + amb if (full or amb != spatial) else spatial

    def save_checkpoint(self, name=None, full=False, best=False):
        name = name or f"{self.name}_ep{self.epoch:04d}"
        rc = self.render_cfg
        meta = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "mean_density": float(self.state.mean_density),
            "mean_density_torso": float(self.state.mean_density_torso),
            # Persist the telemetry-adapted capacities AND the march lattice
            # the field was trained with. A fresh Trainer (infer.py, eval
            # harness) otherwise renders with DEFAULT capacities — on a
            # converged scene that silently drops over half the needed
            # samples (572k needed vs 262k default capacity measured on the
            # quality-harness scene: 15 dB instead of 32 dB) — and a
            # different march_iters/sample_slots changes the quadrature the
            # network was trained against.
            "render_cfg": {
                "ray_capacity_frac": rc.ray_capacity_frac,
                "sample_capacity_mult": rc.sample_capacity_mult,
                "march_iters": rc.march_iters,
                "sample_slots": rc.sample_slots,
                "torso_capacity_frac": rc.torso_capacity_frac,
                "march_group_mult": rc.march_group_mult,
                "march_group_slots": rc.march_group_slots,
            },
            # grid shape is part of the model identity: a restore into a
            # differently-shaped NetworkConfig must fail loudly, not merge
            # mismatched embedding tables (load_checkpoint checks this).
            # Third element (coarsest resolution, --grid_base) added round 5;
            # 2-element checkpoints imply the reference base of 16. Elements
            # 4-6 (the asymmetric 2-D ambient/torso grid, --amb_grid_*) are
            # written only when they differ from the spatial shape; shorter
            # records imply a symmetric grid.
            "grid_shape": self._grid_shape_id(),
        }
        if not best:
            path = os.path.join(self.ckpt_path, f"{name}.npz")
            self.stats["checkpoints"].append(path)
            if len(self.stats["checkpoints"]) > self.max_keep_ckpt:
                old = self.stats["checkpoints"].pop(0)
                if os.path.exists(old):
                    os.remove(old)
            ckpt_lib.save_checkpoint(
                path, self.params, self.state,
                opt_state=self.opt_state if full else None,
                ema_params=self.ema_params if full else None,
                meta=meta,
            )
        else:
            if not self.stats["results"]:
                self.log("[WARN] no evaluated results found, skip saving best checkpoint.")
                return
            # best: EMA weights, density_grid dropped (utils.py:1341-1360)
            params = self._eval_params()
            ckpt_lib.save_checkpoint(
                self.best_path, params, self.state, meta=meta, include_grid=False
            )

    def load_checkpoint(self, path, model_only=False):
        if path.endswith(".pth"):
            params, state_arrays, meta = ckpt_lib.import_torch_checkpoint(path)
            self.params, loaded = ckpt_lib.merge_imported(self.params, params)
            self._apply_state_arrays(state_arrays, meta)
            self.log(f"[INFO] imported torch checkpoint ({len(loaded)} groups).")
            self.opt_state = self.tx.init(self.params)
            return
        params, state, ema, opt_flat, meta = ckpt_lib.load_checkpoint(path)
        saved_shape = meta.get("grid_shape")
        if saved_shape is not None:
            saved = [int(v) for v in saved_shape]
            # expand shorter historical records to the full 6-element form:
            # 2-element (pre-grid_base) carries no base record — compare
            # levels x ch only (None = unknown, base mismatches still fail
            # via the table-shape backstop below); 3-element implies a
            # symmetric 2-D grid (asymmetric shapes didn't exist yet).
            if len(saved) == 2:
                full = saved + [None] + saved + [None]
            elif len(saved) == 3:
                full = saved + saved
            else:
                full = saved
            cur = self._grid_shape_id(full=True)
            if any(s is not None and s != c for s, c in zip(full, cur)):
                fix = (f"--grid_levels {full[0]} --grid_ch {full[1]}"
                       + (f" --grid_base {full[2]}"
                          if full[2] is not None else "")
                       + (f" --amb_grid_levels {full[3]} --amb_grid_ch "
                          f"{full[4]} --amb_grid_base {full[5]}"
                          if full[3:] != full[:3] and full[3] is not None
                          else ""))
                raise ValueError(
                    f"checkpoint {path} was trained with grid shape "
                    f"{'x'.join(str(v) for v in saved)} but this trainer is "
                    f"configured for {'x'.join(str(v) for v in cur)} "
                    f"(levels x ch x base [x 2-D levels x ch x base]) — "
                    f"pass {fix} (the grid shape is part of the model)"
                )
        for key, spec_params in (("encoder", self.params.get("encoder")),
                                 ("encoder_ambient",
                                  self.params.get("encoder_ambient"))):
            if (params is not None and key in params
                    and spec_params is not None
                    and np.shape(params[key]) != tuple(spec_params.shape)):
                # backstop for checkpoints whose meta predates grid_shape (or
                # predates its grid_base/amb elements): catch the mismatch by
                # table shape rather than silently merging mismatched tables
                raise ValueError(
                    f"checkpoint {path} {key} table {np.shape(params[key])} "
                    f"does not match the configured grid "
                    f"({tuple(spec_params.shape)}) — grid_levels/grid_ch/"
                    f"grid_base (and amb_grid_*) must match the checkpoint's"
                )
        cap = meta.get("render_cfg")
        # model_only loads (freeze_loaded_head, 'latest_model') adopt the
        # checkpoint's trained capacities only when this trainer has none of
        # its own yet: a resumed torso trainer has already restored its OWN
        # adapted capacities (incl. torso_capacity_frac) from its workspace
        # checkpoint, and the head checkpoint's must not clobber them.
        if cap and model_only and self._cap_restored:
            cap = None
        if cap and self._user_cap_fields:
            # never clobber capacities the user explicitly set (ADVICE r3):
            # drop those fields from the restore and say so loudly.
            kept = {k: v for k, v in cap.items()
                    if k not in self._user_cap_fields}
            skipped = {k: cap[k] for k in cap if k in self._user_cap_fields}
            if skipped:
                self.log(
                    "[WARN] checkpoint carries trained render capacities "
                    f"{skipped} but these fields were explicitly set at "
                    "construction — keeping the constructor values "
                    f"({ {k: getattr(self.render_cfg, k) for k in skipped} })."
                )
            cap = kept
        if cap:
            import dataclasses

            self.render_cfg = dataclasses.replace(self.render_cfg, **cap)
            self._train_step_fn.clear()
            self._render_fn.clear()
            self._packed_cache = None
            self.log(
                "[INFO] restored trained render capacities "
                f"(frac={self.render_cfg.ray_capacity_frac} "
                f"mult={self.render_cfg.sample_capacity_mult} "
                f"K={self.render_cfg.march_iters} "
                f"slots={self.render_cfg.sample_slots})"
            )
            self._cap_restored = True
        if params is not None:
            self.params, _ = ckpt_lib.merge_imported(self.params, params)
        if state is not None:
            self._apply_state_arrays(state, meta)
        if ema is not None and self.ema_params is not None:
            # merge, don't replace: a head-stage checkpoint's EMA lacks the
            # torso parameter groups present in a torso-stage trainer
            self.ema_params, _ = ckpt_lib.merge_imported(self.ema_params, ema)
        if not model_only:
            self.epoch = int(meta.get("epoch", 0))
            self.global_step = int(meta.get("global_step", 0))
        self.opt_state = self.tx.init(self.params)
        if opt_flat is not None and not model_only:
            # resume Adam moments + the schedule's internal step so the LR
            # does not jump back to the undecayed base (utils.py:1406-1419)
            self.opt_state = ckpt_lib.restore_opt_state(self.opt_state, opt_flat)
            self.log("[INFO] restored optimizer state.")
        self.log(f"[INFO] loaded checkpoint {path} (epoch {self.epoch}).")

    def _apply_state_arrays(self, arrays: dict, meta: dict):
        st = self.state
        if "density_grid" in arrays:
            grid = jnp.asarray(arrays["density_grid"]).reshape(st.density_grid.shape)
            st = st.replace(density_grid=grid)
        if "density_bitfield" in arrays:
            st = st.replace(
                density_bitfield=jnp.asarray(arrays["density_bitfield"], jnp.uint8)
                .reshape(st.density_bitfield.shape)
            )
        if "density_grid_torso" in arrays:
            st = st.replace(
                density_grid_torso=jnp.asarray(arrays["density_grid_torso"])
                .reshape(st.density_grid_torso.shape)
            )
        st = st.replace(
            mean_density=jnp.asarray(meta.get("mean_density", 0.0), jnp.float32),
            mean_density_torso=jnp.asarray(
                meta.get("mean_density_torso", 0.0), jnp.float32
            ),
        )
        # rebuild the acceleration structures (occupied bbox/sphere + fused
        # occ|log-sigma bytes) the marcher renders from
        from ..models.renderer import compute_occ_bbox, compute_occ_sphere
        from ..ops.marching import build_sigma_bytes
        from ..ops.morton import unpackbits

        rc = self.render_cfg
        if "density_grid" in arrays:
            # exact rebuild from the float grid
            thresh = jnp.minimum(st.mean_density, rc.density_thresh)
            st = st.replace(
                occ_bbox=compute_occ_bbox(rc, st.density_grid, thresh),
                occ_sphere=compute_occ_sphere(rc, st.density_grid, thresh),
            ).with_sigma_bytes(build_sigma_bytes(st.density_grid, thresh))
        else:
            # grid-less "best"-style checkpoint (reference drops density_grid
            # but keeps density_bitfield, nerf/utils.py:1353-1355, and renders
            # fine from it). Restore sigma_bytes directly when saved;
            # otherwise synthesize from the bitfield: occupied cells get the
            # MINIMUM 7-bit sigma code (byte 128|1) so the density-prior
            # transmittance cull is a no-op — conservative, never drops work.
            if "sigma_bytes" in arrays:
                st = st.with_sigma_bytes(
                    jnp.asarray(arrays["sigma_bytes"], jnp.uint8)
                    .reshape(st.sigma_bytes.shape)
                )
            elif "density_bitfield" in arrays:
                occ = unpackbits(
                    st.density_bitfield, rc.cascade, rc.grid_size
                ).reshape(-1)
                st = st.with_sigma_bytes(
                    jnp.where(occ > 0, jnp.uint8(129), jnp.uint8(0))
                )
            if "occ_bbox" in arrays and "occ_sphere" in arrays:
                st = st.replace(
                    occ_bbox=jnp.asarray(arrays["occ_bbox"], jnp.float32),
                    occ_sphere=jnp.asarray(arrays["occ_sphere"], jnp.float32),
                )
            elif "sigma_bytes" in arrays or "density_bitfield" in arrays:
                # derive the ray-clip windows from the occupied bits
                occ01 = (st.sigma_bytes >= 128).reshape(
                    rc.cascade, rc.grid_size**3
                ).astype(jnp.float32)
                st = st.replace(
                    occ_bbox=compute_occ_bbox(rc, occ01, 0.5),
                    occ_sphere=compute_occ_sphere(rc, occ01, 0.5),
                )
        self.state = st

    # freeze head keys after importing a head checkpoint for the torso stage
    def freeze_loaded_head(self, head_ckpt: str):
        """Torso stage warm start (main.py:142-157): import head weights;
        param_groups already maps non-torso keys to 'frozen'."""
        if not os.path.exists(head_ckpt):
            raise FileNotFoundError(
                f"--head_ckpt {head_ckpt} not found. Note: the 'best' "
                f"checkpoint (ngp.npz) is only written at eval epochs; use "
                f"the rolling epoch checkpoint (ngp_epXXXX.npz) otherwise."
            )
        self.load_checkpoint(head_ckpt, model_only=True)
