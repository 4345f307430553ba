"""Optimizer: SGD + momentum + weight decay + step LR (Caffe solver parity).

Reference: the solver prototxts (SURVEY.md §2.1 — SGD, momentum 0.9, weight
decay 5e-4, step LR gamma 0.1). optax equivalents, plus a mask so biases and
norm scales skip weight decay (Caffe's decay_mult=0 convention on biases).
"""

from __future__ import annotations

import optax

from aznet_tpu.config import TrainConfig


def lr_schedule(tcfg: TrainConfig):
    """Step decay: LR * GAMMA every STEPSIZE iterations."""
    return optax.exponential_decay(
        init_value=tcfg.LEARNING_RATE,
        transition_steps=tcfg.STEPSIZE,
        decay_rate=tcfg.GAMMA,
        staircase=True,
    )


def _decay_mask(params):
    """True for kernels (decayed), False for biases/scales (decay_mult=0)."""
    import jax

    def rule(path, leaf):
        name = str(getattr(path[-1], "key", getattr(path[-1], "name", "")))
        return name not in ("bias", "scale")

    return jax.tree_util.tree_map_with_path(rule, params)


def _freeze_mask(prefixes):
    """True for params whose path contains a name starting with a prefix."""
    import jax

    def mask(params):
        def rule(path, leaf):
            names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            return any(n.startswith(pref) for n in names for pref in prefixes)

        return jax.tree_util.tree_map_with_path(rule, params)

    return mask


def make_optimizer(tcfg: TrainConfig, params=None):
    tx = [
        optax.add_decayed_weights(
            tcfg.WEIGHT_DECAY, mask=_decay_mask if tcfg.WEIGHT_DECAY else None
        ),
        optax.sgd(lr_schedule(tcfg), momentum=tcfg.MOMENTUM),
    ]
    if tcfg.GRAD_CLIP:
        tx.insert(0, optax.clip_by_global_norm(tcfg.GRAD_CLIP))
    if tcfg.FREEZE_PREFIXES:
        # Zero frozen-layer gradients before everything else (the reference's
        # lr_mult=0 on early conv blocks when fine-tuning) — keeps them out
        # of the global-norm clip...
        mask = _freeze_mask(tcfg.FREEZE_PREFIXES)
        tx.insert(0, optax.masked(optax.set_to_zero(), mask))
        # ...and zero the FINAL update too: add_decayed_weights contributes
        # wd*param regardless of the (zeroed) gradient, which would slowly
        # shrink "frozen" params (~lr*wd per step) and in particular break
        # exact trunk sharing between AZ and FRCNN (decay_mult=0 on frozen
        # layers, matching the reference's lr_mult=0 + decay_mult=0 pairing).
        tx.append(optax.masked(optax.set_to_zero(), mask))
    return optax.chain(*tx)
