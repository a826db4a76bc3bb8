"""Optimizer parity: our LARS(Adam) chain vs a torch oracle implementing
pl_bolts-0.2.2 LARSWrapper semantics around torch.optim.Adam."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optax

from simhand_tpu.train.optimizer import (
    OptimizerConfig,
    _lars_transform,
    make_schedule,
    wd_mask,
)

torch = pytest.importorskip("torch")


def torch_lars_adam_step(params, grads, lr, wd, apply_wd, eta=0.02,
                         clip=True, eps=1e-8, n_steps=1):
    """One (or more) LARSWrapper+Adam steps in torch, returning params."""
    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params]
    opt = torch.optim.Adam(
        [
            {"params": [tp], "weight_decay": wd if aw else 0.0}
            for tp, aw in zip(tparams, apply_wd)
        ],
        lr=lr,
    )
    for _ in range(n_steps):
        for tp, g in zip(tparams, grads):
            tp.grad = torch.tensor(g)
        # pl_bolts 0.2.2 LARSWrapper.step body:
        wds = []
        for group in opt.param_groups:
            weight_decay = group.get("weight_decay", 0)
            wds.append(weight_decay)
            group["weight_decay"] = 0
            for p in group["params"]:
                if p.grad is None:
                    continue
                p_norm = torch.norm(p.data)
                g_norm = torch.norm(p.grad.data)
                if p_norm != 0 and g_norm != 0:
                    new_lr = (eta * p_norm) / (
                        g_norm + p_norm * weight_decay + eps
                    )
                    if clip:
                        new_lr = min(new_lr / group["lr"], 1)
                    p.grad.data += weight_decay * p.data
                    p.grad.data *= new_lr
        opt.step()
        for gi, group in enumerate(opt.param_groups):
            group["weight_decay"] = wds[gi]
    return [tp.detach().numpy() for tp in tparams]


def test_lars_adam_single_step_matches_torch():
    rng = np.random.default_rng(0)
    params = {
        "kernel": rng.normal(size=(4, 3)).astype(np.float32),
        "bias": rng.normal(size=(3,)).astype(np.float32),
    }
    grads = {
        "kernel": rng.normal(size=(4, 3)).astype(np.float32),
        "bias": rng.normal(size=(3,)).astype(np.float32),
    }
    lr, wd = 0.05, 1e-4
    mask = wd_mask(params)
    assert mask["kernel"] is True and mask["bias"] is False

    schedule = lambda count: jnp.float32(lr)
    tx = optax.chain(
        _lars_transform(schedule, 0.02, True, 1e-8, wd, mask),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    got = jax.tree.map(lambda p, u: np.asarray(p + u), params, updates)

    want = torch_lars_adam_step(
        [params["kernel"], params["bias"]],
        [grads["kernel"], grads["bias"]],
        lr, wd, apply_wd=[True, False],
    )
    np.testing.assert_allclose(got["kernel"], want[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["bias"], want[1], rtol=1e-5, atol=1e-6)


def test_schedule_matches_pl_bolts_warmup_cosine():
    cfg = OptimizerConfig(lr=1e-4, warmup_epochs=2, epochs=10,
                          train_iters_per_epoch=5)
    sched = make_schedule(cfg)
    base = cfg.base_lr
    # linear warmup over warmup_steps
    for s in range(cfg.warmup_steps + 1):
        want = base * s / cfg.warmup_steps
        assert float(sched(s)) == pytest.approx(want, rel=1e-5)
    # cosine from base to 0 over the remaining steps
    total = cfg.total_steps
    mid = (cfg.warmup_steps + total) // 2
    t = (mid - cfg.warmup_steps) / (total - cfg.warmup_steps)
    want = base * 0.5 * (1 + np.cos(np.pi * t))
    assert float(sched(mid)) == pytest.approx(want, rel=1e-4)
