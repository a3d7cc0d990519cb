"""Trainer: optax step, EMA, mesh sharding, metrics, checkpointing.

First-class version of what the reference leaves to example scripts and HF
accelerate (SURVEY.md §3.5): clip-by-norm + Adam, EMA update, periodic
sampling hooks, and (new here) pjit sharding over a device mesh and orbax
checkpoint/resume — the reference has no checkpointing at all (SURVEY.md
§5.4).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transfusion_tpu.parallel.mesh import batch_sharding, shard_params
from transfusion_tpu.training.ema import EmaState, ema_update, init_ema


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema: EmaState
    step: Any  # i32


class Trainer:
    def __init__(
        self,
        model,
        optimizer: Optional[optax.GradientTransformation] = None,
        learning_rate: float = 3e-4,
        grad_clip_norm: Optional[float] = 0.5,
        ema_beta: float = 0.99,
        ema_update_every: int = 10,
        ema_update_after_step: int = 100,
        mesh=None,
        velocity_consistency: bool = False,
        velocity_consistency_delta_time: float = 1e-3,
        checkpoint_dir: Optional[str] = None,
        metrics_path: Optional[str] = None,
        profile_logdir: Optional[str] = None,
        profile_start_step: int = 10,
        profile_num_steps: int = 3,
        pipeline_microbatches: Optional[int] = None,  # route the joint loss
        # through pipeline parallelism over the mesh's 'pipe' axis
        # (parallel/pipeline.py). Needs mesh with pipe>1 and a PP-compatible
        # transformer config (unet_skips=False, num_residual_streams=1,
        # dropout=0, depth % pipe == 0); pick microbatches >= 2*pipe to keep
        # the bubble fraction (pipe-1)/(microbatches+pipe-1) small.
        pipeline_schedule: str = "gpipe",  # 'gpipe' (autodiff through the
        # schedule, composes with data/fsdp/tp axes) | '1f1b' (in-schedule
        # loss + backward, O(pipe) activation memory — parallel/
        # pipeline_1f1b.py; composes with 'data' x 'pipe' meshes)
        grad_accumulation: Optional[int] = None,  # split each ragged batch
        # into M microbatches, accumulate grads over M sequential
        # forward+backward passes, apply ONE optimizer step. EXACT: every
        # mean in the joint loss is computed with global denominators
        # gathered across the microbatches first
        # (Transfusion.loss_denominators + _loss_impl(loss_scales=...)), so
        # the accumulated gradient equals the full-batch gradient —
        # not the mean-of-means approximation. Peak activation memory drops
        # ~M-fold (one microbatch's trunk live at a time). Mutually
        # exclusive with pipeline_microbatches.
        fused_update: Optional[bool] = None,  # fuse clip+Adam+EMA into one
        # tree traversal (training/fused_update.py, ~16% -> ~8% of the
        # flagship step). None = auto: on when using the DEFAULT optimizer
        # (optimizer=None), off for custom optimizer chains. Bit-identical
        # trajectories (tests/test_fused_update.py).
    ):
        self.model = model
        self.mesh = mesh
        self.velocity_consistency = velocity_consistency
        self.velocity_delta = velocity_consistency_delta_time
        self.checkpoint_dir = checkpoint_dir
        self.pipeline_microbatches = pipeline_microbatches
        self.pipeline_schedule = pipeline_schedule
        if pipeline_microbatches is not None:
            self._validate_pipeline_config()
        self.grad_accumulation = grad_accumulation
        if grad_accumulation is not None:
            assert grad_accumulation >= 2, (
                "grad_accumulation must be >= 2 (None disables it)"
            )
            assert pipeline_microbatches is None, (
                "grad_accumulation and pipeline_microbatches both split the "
                "batch — pick one"
            )

        tx = optimizer or optax.adam(learning_rate)
        if grad_clip_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
        self.tx = tx
        # fused fast path only knows the default clip->adam chain's math
        # (and a scalar lr — schedules would need the count threaded in)
        if fused_update is None:
            fused_update = optimizer is None and isinstance(
                learning_rate, (int, float)
            )
        self.fused_update = fused_update
        self._fused_cfg = dict(
            learning_rate=learning_rate, grad_clip_norm=grad_clip_norm
        )

        self.ema_cfg = dict(
            beta=ema_beta,
            update_every=ema_update_every,
            update_after_step=ema_update_after_step,
        )
        self._step_fn = None
        self._scan_fns = {}
        self._accum_fns = None
        self._ckpt_mgr = None

        from transfusion_tpu.training.metrics import MetricsLogger, ProfilerHook

        self.metrics = MetricsLogger(metrics_path) if metrics_path else None
        self.profiler = (
            ProfilerHook(profile_logdir, profile_start_step, profile_num_steps)
            if profile_logdir
            else None
        )

    # ------------------------------------------------------------------

    def _validate_pipeline_config(self):
        """Fail fast with actionable messages instead of deep shard_map
        errors (constraints documented in parallel/pipeline.py)."""
        assert self.mesh is not None and "pipe" in self.mesh.axis_names, (
            "pipeline_microbatches needs a mesh with a 'pipe' axis — "
            "make_mesh(pipe=N)"
        )
        pipe = self.mesh.shape["pipe"]
        assert pipe > 1, "pipeline_microbatches set but mesh pipe axis is 1"
        cfg = self.model.transformer_cfg
        assert cfg.get("unet_skips", True) is False, (
            "pipeline parallelism requires transformer unet_skips=False "
            "(cross-stage U-Net skips cannot be pipelined)"
        )
        assert cfg.get("num_residual_streams", 1) == 1, (
            "pipeline parallelism requires num_residual_streams=1"
        )
        assert cfg.get("dropout", 0.0) == 0.0, (
            "pipeline parallelism requires dropout=0"
        )
        depth = cfg["depth"]
        assert depth % pipe == 0, (
            f"transformer depth {depth} must divide over pipe={pipe} stages"
        )
        assert self.pipeline_microbatches >= pipe, (
            f"pick microbatches >= pipe ({pipe}); >= 2*pipe recommended "
            "(bubble fraction (pipe-1)/(microbatches+pipe-1))"
        )
        assert self.pipeline_schedule in ("gpipe", "1f1b"), (
            f"unknown pipeline_schedule {self.pipeline_schedule!r}"
        )
        if self.pipeline_schedule == "1f1b":
            bad = [
                f"{ax}={sz}"
                for ax, sz in self.mesh.shape.items()
                if ax not in ("pipe", "data") and sz > 1
            ]
            assert not bad, (
                "the 1F1B schedule supports 'pipe' (+ optional 'data') "
                f"mesh axes only (got {', '.join(bad)}); use "
                "pipeline_schedule='gpipe' for fsdp/tensor x pipe meshes"
            )

    def init_state(self, rng) -> TrainState:
        params = self.model.init_params(rng)
        if self.mesh is not None:
            shardings = shard_params(params, self.mesh)
            params = jax.device_put(params, shardings)
        state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema=init_ema(params),
            step=jnp.zeros((), jnp.int32),
        )
        return state

    # ------------------------------------------------------------------

    def _make_apply(self):
        """(state, grads) -> (new TrainState, grad_norm): the clip+opt+EMA
        application, shared by the fused per-step path and the
        gradient-accumulation path (which feeds it summed grads)."""
        tx, ema_cfg = self.tx, self.ema_cfg
        fused, fused_cfg = self.fused_update, self._fused_cfg

        def apply(state: TrainState, grads):
            if fused:
                from transfusion_tpu.training.fused_update import (
                    fused_clip_adam_ema,
                )

                new_params, new_opt, new_ema, aux = fused_clip_adam_ema(
                    grads,
                    state.params,
                    state.opt_state,
                    state.ema,
                    learning_rate=fused_cfg["learning_rate"],
                    grad_clip_norm=fused_cfg["grad_clip_norm"],
                    ema_beta=ema_cfg["beta"],
                    ema_update_every=ema_cfg["update_every"],
                    ema_update_after_step=ema_cfg["update_after_step"],
                )
                grad_norm = aux.grad_norm
            else:
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
                new_ema = ema_update(state.ema, new_params, **ema_cfg)
                grad_norm = optax.global_norm(grads)
            return (
                TrainState(
                    params=new_params,
                    opt_state=new_opt,
                    ema=new_ema,
                    step=state.step + 1,
                ),
                grad_norm,
            )

        return apply

    def _build_step(self):
        model = self.model
        apply = self._make_apply()
        use_velocity = self.velocity_consistency
        delta = self.velocity_delta

        pipeline = None
        if self.pipeline_microbatches is not None:
            pipeline = (
                self.mesh, self.pipeline_microbatches, self.pipeline_schedule
            )

        def step_fn(state: TrainState, packed, rng):
            def loss_fn(params):
                total, breakdown = model._loss_impl(
                    params,
                    packed,
                    rng,
                    None,
                    state.ema.params if use_velocity else None,
                    prob_uncond=model.prob_uncond,
                    velocity_delta=delta,
                    train=True,
                    pipeline=pipeline,
                )
                return total, breakdown

            (loss, breakdown), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

            new_state, grad_norm = apply(state, grads)

            metrics = {
                "loss": loss,
                "text_loss": breakdown.text,
                "grad_norm": grad_norm,
            }
            for i, fl in enumerate(breakdown.flow):
                metrics[f"flow_loss_{i}"] = fl

            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # gradient accumulation
    # ------------------------------------------------------------------

    def _build_accum_fns(self):
        model = self.model
        delta = self.velocity_delta

        @jax.jit
        def accum_grad(params, ema_params, packed, rng, scales):
            # all scales (incl. elem/inst counts) are dynamic f32 arrays —
            # a shape change in one microbatch retraces only its own call,
            # never the sibling microbatches' cached traces
            def loss_fn(p):
                return model._loss_impl(
                    p,
                    packed,
                    rng,
                    None,
                    ema_params,
                    prob_uncond=model.prob_uncond,
                    velocity_delta=delta,
                    train=True,
                    pipeline=None,
                    loss_scales=scales,
                )

            (loss, breakdown), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return loss, breakdown, grads

        tree_add = jax.jit(
            lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,)
        )
        apply_fn = jax.jit(self._make_apply(), donate_argnums=(0,))
        return accum_grad, tree_add, apply_fn

    def _train_step_accum(self, state: TrainState, batch, rng):
        """Exact gradient accumulation: M microbatch forward+backward
        passes with GLOBAL loss denominators (loss_denominators /
        loss_scales), grads summed on device, one optimizer update. The
        accumulated (loss, breakdown, grads) equal the full-batch values —
        not the mean-of-means approximation (tests/test_grad_accum.py)."""
        from transfusion_tpu.data.packing import PackedBatch

        M = self.grad_accumulation
        if isinstance(batch, PackedBatch):
            raise ValueError(
                "grad_accumulation needs the ragged batch (list of "
                "ModalitySample) or a list of M pre-packed PackedBatch — "
                "a single PackedBatch cannot be split row-wise here "
                "because its modality groups are shape-bucketed across "
                "the whole batch"
            )
        assert isinstance(batch, (list, tuple)) and len(batch) >= 1
        if all(isinstance(b, PackedBatch) for b in batch):
            assert len(batch) == M, (
                f"got {len(batch)} pre-packed microbatches, expected "
                f"grad_accumulation={M}"
            )
            packed_mbs = list(batch)
        else:
            assert len(batch) >= M, (
                f"batch of {len(batch)} samples cannot split into "
                f"grad_accumulation={M} non-empty microbatches"
            )
            import numpy as np

            packed_mbs = []
            for idx in np.array_split(np.arange(len(batch)), M):
                sub = [batch[i] for i in idx]
                encoded = self.model.encode_modalities(sub)
                packed_mbs.append(
                    self.model.pack(encoded, shift_friendly=True)
                )
        packed_mbs = [jax.tree.map(jnp.asarray, p) for p in packed_mbs]
        if self.mesh is not None:
            packed_mbs = [batch_sharding(self.mesh, p) for p in packed_mbs]

        if self._accum_fns is None:
            self._accum_fns = self._build_accum_fns()
        accum_grad, tree_add, apply_fn = self._accum_fns

        keys = jax.random.split(rng, M)
        denoms = [
            self.model.loss_denominators(p, k, train=True)
            for p, k in zip(packed_mbs, keys)
        ]
        scales = self.model.sum_loss_denominators(denoms)

        ema_params = state.ema.params if self.velocity_consistency else None

        if self.profiler is not None:
            self.profiler(int(state.step))

        loss = None
        grads = None
        text_loss = None
        flow_losses = None
        for p, k in zip(packed_mbs, keys):
            l_m, bd_m, g_m = accum_grad(
                state.params, ema_params, p, k, scales
            )
            if grads is None:
                loss, grads = l_m, g_m
                text_loss = bd_m.text
                flow_losses = list(bd_m.flow)
            else:
                loss = loss + l_m
                grads = tree_add(grads, g_m)
                text_loss = text_loss + bd_m.text
                flow_losses = [
                    a + b for a, b in zip(flow_losses, bd_m.flow)
                ]

        state, grad_norm = apply_fn(state, grads)

        metrics = {
            "loss": loss,
            "text_loss": text_loss,
            "grad_norm": grad_norm,
        }
        for i, fl in enumerate(flow_losses):
            metrics[f"flow_loss_{i}"] = fl

        if self.metrics is not None:
            tokens = sum(int(p.total_tokens) for p in packed_mbs)
            self.metrics.log(int(state.step), metrics, tokens=tokens)
        return state, metrics

    def train_step(self, state: TrainState, batch, rng):
        """One optimizer step on a ragged batch (list of ModalitySamples)
        or a pre-packed PackedBatch. With Trainer(grad_accumulation=M) the
        ragged batch is split into M microbatches whose grads accumulate
        into one exact full-batch update (see _train_step_accum)."""
        if self.grad_accumulation is not None:
            return self._train_step_accum(state, batch, rng)
        if isinstance(batch, list):
            batch = self.model.encode_modalities(batch)
            packed = self.model.pack(batch, shift_friendly=True)
        else:
            packed = batch
        packed = jax.tree.map(jnp.asarray, packed)
        if self.mesh is not None:
            packed = batch_sharding(self.mesh, packed)

        if self._step_fn is None:
            self._step_fn = self._build_step()

        if self.profiler is not None:
            self.profiler(int(state.step))

        state, metrics = self._step_fn(state, packed, rng)

        if self.metrics is not None:
            self.metrics.log(
                int(state.step), metrics, tokens=int(packed.total_tokens)
            )
        return state, metrics

    def train_steps(self, state: TrainState, batches, rng, steps: int):
        """Device-side training loop: `steps` optimizer steps in ONE jitted
        lax.scan dispatch, cycling through `batches` (a list of PackedBatch
        with identical shapes, or one PackedBatch reused every step).

        On a remote/tunneled TPU every dispatch pays RTT; fusing the loop
        amortizes it (measured +3-4% over per-step dispatch even after
        device-resident inputs, scripts/probe_r3_bench.py). Use for steady
        -state training; per-step `train_step` remains the introspectable
        path (metrics each step, profiler hooks).
        Also accepts a single raw ragged batch (list of ModalitySamples,
        the same form `train_step` takes) — it is packed once and reused
        every step. To cycle distinct ragged batches, pack each with
        `model.pack` first so their padded shapes match.
        Returns (state, last_step_metrics)."""
        import functools

        from transfusion_tpu.data.packing import PackedBatch

        assert self.grad_accumulation is None, (
            "train_steps does not accumulate gradients — use per-step "
            "train_step with grad_accumulation, or drop grad_accumulation"
        )
        if not isinstance(batches, (list, tuple)):
            batches = [batches]
        elif batches and not any(
            isinstance(b, PackedBatch) for b in batches
        ):
            # a raw ragged batch (list of per-sample modality lists), the
            # form train_step accepts: pack it as ONE batch, not N batches
            encoded = self.model.encode_modalities(list(batches))
            batches = [self.model.pack(encoded, shift_friendly=True)]
        trees = [jax.tree.map(jnp.asarray, b) for b in batches]
        if len({jax.tree.structure(t) for t in trees}) > 1:
            raise ValueError(
                "train_steps batches must share one packed structure (same "
                "padded length and same modality group shapes) so they can "
                "stack into one device array — pack with a fixed pad_len "
                "and shape-bucketed modalities, or use train_step per batch"
            )
        packed_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        if self.mesh is not None:
            packed_stack = jax.tree.map(jnp.asarray, packed_stack)

        if self._step_fn is None:
            self._step_fn = self._build_step()
        step_fn = self._step_fn
        n_b = len(batches)

        # cache the jitted scan per batch-cycle length: a fresh closure per
        # call would retrace on every train_steps invocation (bench runs one
        # call per measurement window)
        scan_steps = self._scan_fns.get(n_b)
        if scan_steps is None:

            @functools.partial(
                jax.jit, static_argnums=(3,), donate_argnums=(0,)
            )
            def scan_steps(state, packed_stack, rng, steps):
                def body(carry, i):
                    st, ky = carry
                    ky, k = jax.random.split(ky)
                    packed = jax.tree.map(
                        lambda x: x[i % n_b], packed_stack
                    )
                    st, m = step_fn(st, packed, k)
                    return (st, ky), m

                (state, _), ms = jax.lax.scan(
                    body, (state, rng), jnp.arange(steps)
                )
                return state, jax.tree.map(lambda x: x[-1], ms)

            self._scan_fns[n_b] = scan_steps

        return scan_steps(state, packed_stack, rng, steps)

    # ------------------------------------------------------------------
    # checkpointing (orbax)
    # ------------------------------------------------------------------

    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            assert self.checkpoint_dir is not None, "set checkpoint_dir"
            self._ckpt_mgr = ocp.CheckpointManager(
                self.checkpoint_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=3),
            )
        return self._ckpt_mgr

    def save(self, state: TrainState, wait: bool = True):
        """Checkpoint `state` at its current step.

        wait=False makes the on-disk write asynchronous (orbax's background
        checkpointer): the device->host snapshot is taken synchronously
        before returning, so training may mutate/donate `state` immediately,
        while serialization and fsync proceed off-thread. Join explicitly
        with `wait_until_finished()`; a subsequent `save` also joins the
        previous write first (orbax serializes saves per manager).
        """
        import orbax.checkpoint as ocp

        mgr = self._manager()
        mgr.save(
            int(state.step), args=ocp.args.StandardSave(jax.device_get(state))
        )
        if wait:
            mgr.wait_until_finished()

    def wait_until_finished(self):
        """Block until any in-flight async `save(wait=False)` is durable."""
        if self._ckpt_mgr is not None:
            self._ckpt_mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        mgr = self._manager()
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None
        state = mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(state_template))
        )
        if self.mesh is not None:
            # re-apply the mesh shardings init_state established: orbax
            # returns host arrays and the next jit would otherwise place
            # them replicated — an OOM on topologies where params (and the
            # param-shaped optimizer moments / EMA copy) only fit sharded.
            # Any subtree structurally identical to the param tree (adam
            # mu/nu, ema.params, ...) gets the same path-based shardings.
            shardings = shard_params(state.params, self.mesh)
            params_treedef = jax.tree.structure(state.params)

            import dataclasses as _dc

            def put_like_params(t):
                if jax.tree.structure(t) == params_treedef:
                    return jax.device_put(t, shardings)
                if isinstance(t, dict):
                    return {k: put_like_params(v) for k, v in t.items()}
                if isinstance(t, tuple):
                    sub = [put_like_params(x) for x in t]
                    return type(t)(*sub) if hasattr(t, "_fields") else tuple(sub)
                if isinstance(t, list):
                    return [put_like_params(x) for x in t]
                if _dc.is_dataclass(t) and not isinstance(t, type):
                    return type(t)(
                        **{
                            f.name: put_like_params(getattr(t, f.name))
                            for f in _dc.fields(t)
                        }
                    )
                return t

            state = put_like_params(state)
        return state
