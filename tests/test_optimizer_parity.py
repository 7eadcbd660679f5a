"""Optimizer parity: our optax chain (add_decayed_weights -> adam with the
poly epoch schedule) vs the reference's torch.optim.Adam(weight_decay) +
LambdaLR((1-epoch/E)^0.9) (train.py:177-189), stepped through multiple
epochs on identical params/grads."""
import numpy as np
import jax.numpy as jnp
import optax

from xlstm_hved_tpu.config import TrainConfig
from xlstm_hved_tpu.engine.train import make_optimizer, poly_schedule


def test_adam_l2_poly_matches_torch():
    import torch

    lr, wd, power = 1e-3, 1e-5, 0.9
    num_epochs, steps_per_epoch = 4, 3
    rng = np.random.RandomState(0)
    p0 = rng.randn(7, 5).astype(np.float32)
    grads = [rng.randn(7, 5).astype(np.float32)
             for _ in range(num_epochs * steps_per_epoch)]

    # ---- torch side: the reference's exact construction ----
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    sch = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=[lambda epoch: (1 - epoch / num_epochs) ** power])
    step = 0
    for _epoch in range(num_epochs):
        for _ in range(steps_per_epoch):
            tp.grad = torch.from_numpy(grads[step].copy())
            opt.step()
            step += 1
        sch.step()  # the reference steps the scheduler per epoch

    # ---- our side ----
    cfg = TrainConfig(learning_rate=lr, weight_decay=wd,
                      num_epochs=num_epochs, poly_power=power)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_poly_schedule_values():
    sched = poly_schedule(1e-3, num_epochs=10, steps_per_epoch=5, power=0.9)
    # steps within an epoch share the LR; epoch k uses (1 - k/10)^0.9
    for step, epoch in ((0, 0), (4, 0), (5, 1), (49, 9)):
        expect = 1e-3 * (1 - epoch / 10) ** 0.9
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)
