"""Sharded training step for HaploFormer.

dp on the ``data`` mesh axis (batch), tp on ``model`` (attention heads / MLP
hidden) via the PARAM_RULES shardings; gradients reduce through XLA-inserted
collectives — no hand-written NCCL/pmean plumbing.  bf16 compute, float32
params/optimizer.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from haplohyped_tpu.models.haploformer import HaploFormer, HaploFormerConfig
from haplohyped_tpu.parallel.mesh import param_shardings, shard_batch_spec


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def loss_fn(params, model: HaploFormer, hap1, hap2, n_variants):
    out = model.apply({"params": params}, hap1, hap2)
    # variant-count regression (labels come from the sampler for free)
    reg = jnp.mean((out["variant_count"] - n_variants.astype(jnp.float32)) ** 2)
    # self-supervised token head: predict the dominant base of each pooled
    # window token of hap1 (cheap MLM-style signal; targets from the input).
    # Codes input (B, L): one-hot here — fused on device, never in HBM.
    cfg = model.cfg
    hap1_oh = (
        hap1
        if hap1.ndim == 3
        else jax.nn.one_hot(hap1, cfg.num_channels, dtype=jnp.float32)
    )
    B, L, C = hap1_oh.shape
    T = out["base_logits"].shape[1]
    pooled = hap1_oh[:, : T * cfg.pool, :].reshape(B, T, cfg.pool, C).sum(axis=2)
    targets = jnp.argmax(pooled, axis=-1)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        out["base_logits"], targets
    ).mean()
    return reg * 0.01 + ce, {"reg": reg, "ce": ce}


def create_train_state(
    model: HaploFormer,
    rng: jax.Array,
    sample_batch: tuple,
    learning_rate: float = 3e-4,
    mesh: Mesh | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    hap1, hap2 = sample_batch
    params = model.init(rng, hap1, hap2)["params"]
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    if mesh is not None:
        p_sh = param_shardings(params, mesh)
        params = jax.device_put(params, p_sh)
        opt_state = jax.device_put(opt_state, _opt_shardings(opt_state, p_sh, mesh))
        state = TrainState(params=params, opt_state=opt_state, step=state.step)
    return state, tx


def _opt_shardings(opt_state, p_sh, mesh):
    """Optimizer slots mirror parameter shardings; scalars replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat_p, treedef_p = jax.tree_util.tree_flatten(p_sh)

    def assign(leaf):
        return NamedSharding(mesh, P())

    # adamw state: (ScaleByAdamState(count, mu, nu), EmptyState) — mu/nu are
    # param-shaped pytrees; map them to the param shardings by structure.
    def map_like(x):
        try:
            flat_x, treedef_x = jax.tree_util.tree_flatten(x)
            if treedef_x == treedef_p:
                return jax.tree_util.tree_unflatten(treedef_p, flat_p)
        except Exception:
            pass
        return jax.tree.map(assign, x)

    if isinstance(opt_state, tuple):
        out = []
        for part in opt_state:
            if hasattr(part, "_fields"):  # NamedTuple state
                fields = {}
                for name in part._fields:
                    fields[name] = map_like(getattr(part, name))
                out.append(type(part)(**fields))
            else:
                out.append(map_like(part))
        return tuple(out)
    return map_like(opt_state)


def make_train_step(model: HaploFormer, tx: optax.GradientTransformation, mesh: Mesh | None = None):
    """Returns a jitted ``step(state, hap1, hap2, n_variants) -> (state, metrics)``."""

    def train_step(state: TrainState, hap1, hap2, n_variants):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, model, hap1, hap2, n_variants
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step)

    batch_sh = shard_batch_spec(mesh)
    return jax.jit(
        train_step,
        in_shardings=(None, batch_sh, batch_sh, batch_sh),
    )


def make_fused_train_step(model: HaploFormer, tx, sampler, mesh: Mesh | None = None):
    """Fuse sampling INTO the jitted train step: one dispatch per step draws
    the haplotype batch on device and immediately trains on it — there is no
    host-visible data path at all (the fully TPU-native answer to the
    reference's DataLoader loop).

    Returns ``fused(state, step_idx) -> (state, metrics)``.
    """
    import jax.numpy as jnp

    from haplohyped_tpu.data.sampler import _sample_batch

    _, _, lengths = sampler._genome_dev
    enc = sampler._enc
    regions = sampler._regions_dev
    base_key = sampler._base_key
    cfg = sampler.config

    def fused(state: TrainState, step_idx):
        batch = _sample_batch(
            base_key,
            step_idx,
            lengths,
            regions,
            enc,
            L=cfg.seq_length,
            K=cfg.max_variants_per_window,
            B=cfg.batch_size,
            D=sampler.cohort.num_donors,
            num_channels=sampler.num_channels,
            onehot_dtype=sampler.onehot_dtype,
            emit_onehot=sampler.emit_onehot,
            kernel=sampler.kernel,
            interpret=sampler._interpret,
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, model, batch.hap1, batch.hap2, batch.n_variants
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, **aux}

    return jax.jit(fused)


def save_checkpoint(state: TrainState, ckpt_dir: str, step: int | None = None) -> str:
    """Persist a TrainState with orbax (training checkpoint/resume — the
    reference has no checkpointing at all)."""
    import os

    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, jax.device_get(template))
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored


def train_on_sampler(
    sampler,
    model: HaploFormer | None = None,
    steps: int = 100,
    learning_rate: float = 3e-4,
    mesh: Mesh | None = None,
    log_every: int = 20,
):
    """The end-to-end slice: on-device sampled haplotype batches feed a
    sharded training step — no host data path at all after setup.

    Returns (final TrainState, list of loss values).
    """
    import logging

    logger = logging.getLogger(__name__)
    if model is None:
        model = HaploFormer(HaploFormerConfig())

    first = sampler.sample()
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(
        model, rng, (first.hap1, first.hap2), learning_rate, mesh=mesh
    )
    step_fn = make_train_step(model, tx, mesh=mesh)
    losses = []
    for i in range(steps):
        batch = sampler.sample()
        state, metrics = step_fn(state, batch.hap1, batch.hap2, batch.n_variants)
        if (i + 1) % log_every == 0 or i == steps - 1:
            loss = float(metrics["loss"])
            losses.append(loss)
            logger.info("step %d loss %.4f", i + 1, loss)
    return state, losses
